"""Training-trajectory parity: the reference torch train loop vs ours.

Every parity proof so far is single-forward with random weights; the
reference's real capability is that its TRAINING LOOP converges.  This
harness runs the reference's own ``InterTrainer.train`` (CPU torch,
/root/reference/runners/InterTrainer.py:369-560) and our
``train/inter.make_train_step`` side by side on a shared tiny fixture —
identical init weights (ported via tools/torch_port), identical batches,
identical config parsed by each side's own parser from the SAME argv —
and compares the per-step loss curves plus end-of-run validation
metrics.

What is patched on the torch side (infrastructure ONLY — the forward,
losses, backward, and Adamax step are 100% reference code):

- ``torchvision`` is absent in this env: a stub provides ``models.vgg19``
  (the real torchvision VGG19 layer layout, deterministic seed-7 init —
  pretrained weights are egress-blocked, and BOTH sides get this same
  net so the vgg loss term still exercises identical math),
  ``transforms``/``datasets`` placeholders, and ``utils.make_grid``.
- ``.cuda()`` / ``set_device`` become no-ops (no GPU here);
  ``DistributedDataParallel`` becomes a passthrough (world size 1 makes
  its gradient averaging the identity); ``dist.all_reduce`` a no-op.
- ``get_dataset`` returns fixture-backed torch Datasets;
  ``DistributedSampler`` a sequential sampler (so batch ORDER is the
  fixture order on both sides).
- ``prepare_image_set`` returns a dummy (viz only); the tensorboardX
  writer is replaced by a recorder capturing the exact per-step
  ``loss_dict`` the reference logs (InterTrainer.py:446-448).

Writes docs/TRAJPARITY_r4.json and prints one summary JSON line.
Used by tests/test_traj_parity.py (slow lane) at a smaller step count.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import logging
import os
import sys
import tempfile
import types
from collections import OrderedDict

import numpy as np

REF_ROOT = os.environ.get("DVIE_REF_ROOT", "/root/reference")
N_CLASSES = 20


# ---------------------------------------------------------------------------
# shared fixture
# ---------------------------------------------------------------------------

def _smooth(rng: np.random.RandomState, h: int, w: int, c: int) -> np.ndarray:
    """Low-frequency random field in [-1, 1]: coarse noise, kron-upsampled,
    box-blurred (smooth enough that SSIM/GDL are meaningful)."""
    f = 8
    base = rng.uniform(-1, 1, (h // f + 2, w // f + 2, c)).astype(np.float32)
    up = np.kron(base, np.ones((f, f, 1), np.float32))
    for _ in range(3):
        up = 0.25 * (up + np.roll(up, 1, 0) + np.roll(up, 1, 1)
                     + np.roll(np.roll(up, 1, 0), 1, 1))
    out = up[f // 2:f // 2 + h, f // 2:f // 2 + w]
    m = np.abs(out).max() or 1.0
    return (out / m).astype(np.float32)


def make_fixture(n_train: int, n_val: int, h: int, w: int,
                 seed: int = 1234, n_frames: int = 3) -> dict:
    """n samples of (frame1..frameK, seg1..segK): smooth scenes
    translating a constant 2px/frame — intermediate frames ARE the
    interpolants/extrapolants of their neighbors, so the task is
    learnable and losses can genuinely descend.  ``n_frames=4`` serves
    the extrapolation rollout (2 context + 2 predicted)."""
    rng = np.random.RandomState(seed)
    n = n_train + n_val
    frames = np.zeros((n, n_frames, h, w, 3), np.float32)
    segs = np.zeros((n, n_frames, h, w), np.int64)
    for i in range(n):
        img = _smooth(rng, h, w, 3)
        logits = _smooth(rng, h, w, 6)  # 6 active classes of 20
        ids = np.argmax(logits, -1) + rng.randint(0, N_CLASSES - 6)
        dx, dy = rng.randint(-3, 4), rng.randint(-2, 3)
        for t in range(n_frames):
            frames[i, t] = np.roll(img, (t * dy, t * dx), (0, 1))
            segs[i, t] = np.roll(ids, (t * dy, t * dx), (0, 1))
        frames[i] += rng.normal(0, 0.01, frames[i].shape).astype(np.float32)
    np.clip(frames, -1, 1, out=frames)
    return {
        "train_frames": frames[:n_train], "train_segs": segs[:n_train],
        "val_frames": frames[n_train:], "val_segs": segs[n_train:],
    }


def _one_hot_chw(ids: np.ndarray) -> np.ndarray:
    """(H, W) int -> (C, H, W) f32 one-hot (reference folder.py layout)."""
    return np.eye(N_CLASSES, dtype=np.float32)[ids].transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _build_stub_vgg19(torch, nn):
    """torchvision vgg19().features layout, deterministic seed-7 init."""
    g = torch.Generator().manual_seed(7)
    layers = []
    cin = 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(cin, v, 3, padding=1)
            with torch.no_grad():
                # torch default (kaiming_uniform) but from OUR generator so
                # every vgg19() call yields bit-identical weights
                fan_in = cin * 9
                bound = np.sqrt(6.0 / ((1 + 5) * fan_in))  # a=sqrt(5)
                conv.weight.uniform_(-bound, bound, generator=g)
                bb = 1.0 / np.sqrt(fan_in)
                conv.bias.uniform_(-bb, bb, generator=g)
            layers.extend([conv, nn.ReLU(inplace=True)])
            cin = v
    feats = nn.Sequential(*layers)

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = feats
    return _VGG()


def _install_torch_stubs():
    import torch
    import torch.nn as nn

    # Other parity harnesses (tests/test_*_parity.py loaders) install
    # their own PARTIAL torchvision stubs — e.g. test_attn_legacy_parity
    # registers only .models/.utils.  Guarding on the top-level name
    # alone made this loader skip its own stub and die on the
    # reference's ``import torchvision.transforms`` when those tests ran
    # first in the same session, so: keep whatever exists, fill in every
    # missing submodule/attr individually.
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    models = sys.modules.get("torchvision.models")
    if models is None:
        models = getattr(tv, "models", None) or types.ModuleType(
            "torchvision.models")
        sys.modules["torchvision.models"] = models
    # unconditional: another harness's placeholder (e.g. ``lambda: None``)
    # would crash the reference trainer's VGGLoss construction
    models.vgg19 = (
        lambda pretrained=False, **kw: _build_stub_vgg19(torch, nn))
    transforms = sys.modules.get("torchvision.transforms")
    if transforms is None:
        transforms = getattr(tv, "transforms", None) or types.ModuleType(
            "torchvision.transforms")
        sys.modules["torchvision.transforms"] = transforms
    for name in ("Compose", "ToTensor", "Normalize", "Resize"):
        if not hasattr(transforms, name):
            setattr(transforms, name, type(name, (), {"__init__":
                    lambda self, *a, **k: None}))
    datasets = sys.modules.get("torchvision.datasets")
    if datasets is None:
        datasets = getattr(tv, "datasets", None) or types.ModuleType(
            "torchvision.datasets")
        sys.modules["torchvision.datasets"] = datasets
    utils = sys.modules.get("torchvision.utils")
    if utils is None:
        utils = getattr(tv, "utils", None) or types.ModuleType(
            "torchvision.utils")
        sys.modules["torchvision.utils"] = utils
    if not hasattr(utils, "make_grid"):
        utils.make_grid = lambda t, *a, **k: (t if hasattr(t, "dim")
                                              else torch.zeros(3, 4, 4))
    if not hasattr(utils, "save_image"):
        utils.save_image = lambda *a, **k: None
    tv.models, tv.transforms, tv.datasets, tv.utils = (
        models, transforms, datasets, utils)
    if "yacs" not in sys.modules:
        class _CN(dict):
            def __getattr__(self, k):
                return self[k]

            def __setattr__(self, k, v):
                self[k] = v
        yacs = types.ModuleType("yacs")
        cfg = types.ModuleType("yacs.config")
        cfg.CfgNode = _CN
        yacs.config = cfg
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = cfg
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]

    # device no-ops (CPU-only torch build)
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None
    nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    class _DDP(nn.Module):
        def __init__(self, module, device_ids=None, **kw):
            super().__init__()
            self.module = module

        def forward(self, *a, **kw):
            return self.module(*a, **kw)

    torch.nn.parallel.DistributedDataParallel = _DDP

    class _SeqSampler(torch.utils.data.Sampler):
        def __init__(self, dataset, *a, **k):
            self.n = len(dataset)

        def __iter__(self):
            return iter(range(self.n))

        def __len__(self):
            return self.n

        def set_epoch(self, e):
            pass

    torch.utils.data.distributed.DistributedSampler = _SeqSampler
    return torch


class _Recorder:
    """Stand-in tensorboardX writer capturing per-step scalar dicts."""

    def __init__(self):
        self.steps = []

    def add_scalars(self, tag, info, step):
        if tag == "losses":
            self.steps.append({k: float(v) for k, v in info.items()})

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


def _load_ref_module(fname: str, modname: str, text_subs=()):
    """Load a reference runner module standalone.  ``text_subs`` applies
    documented source-level bug patches before exec (e.g. the
    ExtraTrainer rollout's undefined names) — the patched text is the
    minimal fix our framework implements, cited at each use site."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_torch_stubs()
    path = os.path.join(REF_ROOT, "runners", fname)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    if text_subs:
        with open(path) as f:
            src = f.read()
        for old, new in text_subs:
            assert old in src, f"bug-patch anchor missing: {old!r}"
            src = src.replace(old, new)
        code = compile(src, path, "exec")
        exec(code, mod.__dict__)
    else:
        spec.loader.exec_module(mod)
    return mod


def _load_ref_trainer_module():
    return _load_ref_module("InterTrainer.py", "_ref_intertrainer")


def _make_ref_datasets(torch, fixture, n_frames: int = 3,
                       bbox_shape=None):
    class _DS(torch.utils.data.Dataset):
        def __init__(self, frames, segs):
            self.frames, self.segs = frames, segs

        def __len__(self):
            return len(self.frames)

        def __getitem__(self, i):
            out = {}
            for t in range(n_frames):
                out[f"frame{t + 1}"] = torch.from_numpy(
                    self.frames[i, t].transpose(2, 0, 1).copy())
                out[f"seg{t + 1}"] = torch.from_numpy(
                    _one_hot_chw(self.segs[i, t]))
            if bbox_shape is not None:
                # the GAN trainer reads data['bboxes'] unconditionally
                # (InterGANTrainer.py:375); zeros are inert for the
                # non-det disc families
                out["bboxes"] = torch.zeros(*bbox_shape)
            return out

    return (_DS(fixture["train_frames"], fixture["train_segs"]),
            _DS(fixture["val_frames"], fixture["val_segs"]))


def _ref_args(argv, workdir):
    import tools_optdiff

    sys.argv = ["main.py"] + argv
    opt_path = os.path.join(REF_ROOT, "options", "options.py")
    spec = importlib.util.spec_from_file_location("_ref_options_tp", opt_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_options_tp"] = mod
    spec.loader.exec_module(mod)
    o = mod.Options()
    o.initialize()
    args = o.parser.parse_args(argv)
    args.path = workdir
    args.rank = 0
    args.gpus = 1
    logger = logging.getLogger("trajparity_ref")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        logger.addHandler(logging.FileHandler(
            os.path.join(workdir, "ref.log")))
    args.logger = logger
    assert tools_optdiff  # keep the shared-parser dependency explicit
    return args


def run_reference(argv, fixture, steps):
    """Run the reference InterTrainer on the fixture; returns init state
    dicts (model + vgg), per-step loss dicts, and val metric averages."""
    torch = _install_torch_stubs()
    mod = _load_ref_trainer_module()
    mod.dist = types.SimpleNamespace(all_reduce=lambda t, *a, **k: None)
    mod.get_dataset = lambda args: _make_ref_datasets(torch, fixture)

    workdir = tempfile.mkdtemp(prefix="trajparity_ref_")
    os.makedirs(os.path.join(workdir, "checkpoint"), exist_ok=True)
    args = _ref_args(argv, workdir)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    trainer = mod.InterTrainer(args)
    trainer.writer = _Recorder()
    trainer.prepare_image_set = lambda *a, **k: torch.zeros(3, 4, 4)

    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in trainer.model.module.state_dict().items()}
    vgg_sd = {k: v.detach().cpu().numpy().copy()
              for k, v in trainer.RGBLoss.vgg_loss.vgg_net.vgg
              .state_dict().items()}

    trainer.set_epoch(0)
    trainer.train()
    train_steps = trainer.writer.steps[:steps]

    # validation pass: a fresh split='val' trainer (the reference keys its
    # loss objects off args.split), fed the TRAINED weights
    args_val = _ref_args(argv, workdir)
    args_val.split = "val"
    args_val.checkepoch_range = True  # skips load_checkpoint
    meters = []
    real_meter = mod.AverageMeter

    class _RecMeter(real_meter):
        def __init__(self):
            super().__init__()
            meters.append(self)

    mod.AverageMeter = _RecMeter
    try:
        vtr = mod.InterTrainer(args_val)
        vtr.model.module.load_state_dict(
            trainer.model.module.state_dict())
        vtr.writer = _Recorder()
        vtr.prepare_image_set = lambda *a, **k: torch.zeros(3, 4, 4)
        vtr.validate()
    finally:
        mod.AverageMeter = real_meter
    crit = ["coarse_l1", "coarse_psnr", "coarse_ssim", "coarse_vgg",
            "coarse_iou"]
    val = {c: float(m.avg) for c, m in zip(crit, meters)}

    final_sd = {k: v.detach().cpu().numpy().copy()
                for k, v in trainer.model.module.state_dict().items()}
    return {"init_sd": init_sd, "vgg_sd": vgg_sd, "steps": train_steps,
            "val": val, "final_sd": final_sd}


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def _our_batches(frames, segs, bs):
    """NHWC batches with one-hot f32 segs, fixture order."""
    n = (len(frames) // bs) * bs
    eye = np.eye(N_CLASSES, dtype=np.float32)
    for i in range(0, n, bs):
        batch = {}
        for t in range(3):
            batch[f"frame{t + 1}"] = frames[i:i + bs, t]
            batch[f"seg{t + 1}"] = eye[segs[i:i + bs, t]]
        yield batch


def run_ours(argv, fixture, init_sd, vgg_sd, steps):
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.cli.options import (
        parse_args,
    )
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.models.features import (
        load_torch_vgg19_state,
    )
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_hrnet,
    )
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter as inter_lib,
        state as state_lib,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        init_vgg_frozen,
    )

    sub = argv.index("INTER")
    cfg = parse_args(argv[:sub] + ["--compute_dtype", "float32"]
                     + argv[sub:])
    model = registry.build_model(cfg)

    h, w = cfg.input_h, cfg.input_w
    x0 = jnp.zeros((cfg.batch_size, h, w, 6), jnp.float32)
    s0 = jnp.zeros((cfg.batch_size, h, w, 2 * N_CLASSES), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, x0, s0, train=False)
    variables = dict(variables)

    coarse_sd = {k[len("coarse_model."):]: v for k, v in init_sd.items()
                 if k.startswith("coarse_model.")}
    params = dict(variables["params"])
    params["coarse_model"] = port_hrnet(coarse_sd, params["coarse_model"])
    variables["params"] = params

    vgg_params = init_vgg_frozen(cfg, jax.random.PRNGKey(1))
    vgg_params = load_torch_vgg19_state(vgg_params, vgg_sd)

    state = state_lib.create_train_state(cfg, variables,
                                         frozen={"vgg": vgg_params})
    train_step = jax.jit(inter_lib.make_train_step(cfg, model))
    eval_step = jax.jit(inter_lib.make_eval_step(cfg, model))

    rng = jax.random.PRNGKey(0)
    step_records = []
    for i, batch in enumerate(_our_batches(
            fixture["train_frames"], fixture["train_segs"],
            cfg.batch_size)):
        if i >= steps:
            break
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss_dict = train_step(state, jb, rng)
        step_records.append({k: float(v) for k, v in loss_dict.items()})

    val_acc: dict = {}
    n_val = 0
    for batch in _our_batches(fixture["val_frames"], fixture["val_segs"],
                              cfg.batch_size):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        metrics = eval_step(state, jb, rng)
        for k, v in metrics.items():
            val_acc[k] = val_acc.get(k, 0.0) + float(v)
        n_val += 1
    val = {k: v / max(n_val, 1) for k, v in val_acc.items()}
    return {"steps": step_records, "val": val, "state": state}


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

def compare(ref, ours):
    keys = [k for k in ref["steps"][0] if k in ours["steps"][0]]
    per_step = []
    for i, (r, o) in enumerate(zip(ref["steps"], ours["steps"])):
        row = {}
        for k in keys:
            denom = max(abs(r[k]), 1e-6)
            row[k] = abs(o[k] - r[k]) / denom
        per_step.append(row)
    max_rel = {k: max(row[k] for row in per_step) for k in keys}
    last = per_step[-1] if per_step else {}
    val_rel = {}
    for k in ref.get("val", {}):
        if k in ours.get("val", {}):
            denom = max(abs(ref["val"][k]), 1e-6)
            val_rel[k] = abs(ours["val"][k] - ref["val"][k]) / denom
    return {"n_steps": len(per_step), "max_rel_per_key": max_rel,
            "final_step_rel": last, "val_rel": val_rel,
            "per_step_loss_all": [
                {"ref": r["loss_all"], "ours": o["loss_all"]}
                for r, o in zip(ref["steps"], ours["steps"])]}


def build_argv(h, w, bs):
    return ["--dataset", "cityscape", "--mode", "xs2xs", "--syn_type",
            "inter", "--input_h", str(h), "--input_w", str(w),
            "--bs", str(bs), "--epochs", "1", "--split", "train",
            "--nw", "0", "--disp_interval", "10000",
            "INTER", "--model", "InterNet", "--train_coarse"]


# ---------------------------------------------------------------------------
# GAN variant: InterGANTrainer (single combined G+D backward, SpectralNorm
# power iteration, VAE BatchNorm stats, Adamax-G/Adam-D; cmd:196-209 recipe
# at frame-disc scope).  The SN disc's AvgPool2d(16) head hard-codes 128x128
# inputs (nets/FrameDisc.py:147), so this variant runs at 128x128.
# ---------------------------------------------------------------------------


def build_argv_gan(h, w, bs):
    return ["--dataset", "cityscape", "--mode", "xs2xs", "--syn_type",
            "inter", "--input_h", str(h), "--input_w", str(w),
            "--bs", str(bs), "--epochs", "1", "--split", "train",
            "--nw", "0", "--disp_interval", "10000", "--kld_w", "20",
            "INTER", "--model", "InterGANNet", "--coarse_model", "VAEHRNet",
            "--train_coarse", "--vae", "--gan",
            "--frame_disc", "--frame_disc_model", "FrameSNDiscriminator",
            "--train_frame_disc", "--frame_disc_g_w", "0.4",
            "--frame_disc_d_w", "0.001", "--frame_disc_lr", "0.0001"]


def make_gan_eps(bs: int, latent: int = 1024, seed: int = 777) -> np.ndarray:
    """Shared fixed VAE reparameterization noise.  Cross-framework RNGs
    are not comparable (torch Philox vs JAX Threefry), so BOTH sides get
    this one eps draw; it is nonzero, so the logvar head still receives
    reconstruction gradients through ``z = mu + eps*std``."""
    return np.random.RandomState(seed).normal(
        0, 1, (bs, latent)).astype(np.float32)


def run_reference_gan(argv, fixture, steps, eps):
    torch = _install_torch_stubs()
    mod = _load_ref_module("InterGANTrainer.py", "_ref_intergantrainer")
    mod.dist = types.SimpleNamespace(all_reduce=lambda t, *a, **k: None)
    mod.get_dataset = lambda args: _make_ref_datasets(
        torch, fixture, 3, bbox_shape=(3, 10, 4))

    workdir = tempfile.mkdtemp(prefix="trajparity_gan_")
    os.makedirs(os.path.join(workdir, "checkpoint"), exist_ok=True)
    args = _ref_args(argv, workdir)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    trainer = mod.InterGANTrainer(args)
    trainer.writer = _Recorder()
    trainer.prepare_image_set = lambda *a, **k: torch.zeros(3, 4, 4)

    # fixed-eps reparameterize (same math as nets/HRNet.py:960-964 with
    # eps injected; see make_gan_eps)
    coarse = trainer.model.module.coarse_model
    eps_t = torch.from_numpy(eps)

    def _rep(self, mu=None, logvar=None, bs=None):
        if self.training:
            std = logvar.mul(0.5).exp_()
            return eps_t.to(std.dtype).mul(std).add_(mu)
        return torch.zeros(bs, 1024)

    coarse.reparameterize = types.MethodType(_rep, coarse)

    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in trainer.model.module.state_dict().items()}
    vgg_sd = {k: v.detach().cpu().numpy().copy()
              for k, v in trainer.RGBLoss.vgg_loss.vgg_net.vgg
              .state_dict().items()}

    trainer.set_epoch(0)
    trainer.train()
    final_sd = {k: v.detach().cpu().numpy().copy()
                for k, v in trainer.model.module.state_dict().items()}
    return {"init_sd": init_sd, "vgg_sd": vgg_sd,
            "steps": trainer.writer.steps[:steps], "final_sd": final_sd}


def run_ours_gan(argv, fixture, init_sd, vgg_sd, steps, eps):
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.cli.options import (
        parse_args,
    )
    from deep_video_interpolation_extrapolation_tpu.models.features import (
        load_torch_vgg19_state,
    )
    from deep_video_interpolation_extrapolation_tpu.tools import torch_port
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter_gan,
        state as state_lib,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        init_vgg_frozen,
    )

    sub = argv.index("INTER")
    cfg = parse_args(argv[:sub] + ["--compute_dtype", "float32"]
                     + argv[sub:])

    batches = list(_our_batches(fixture["train_frames"],
                                fixture["train_segs"], cfg.batch_size))
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    variables = inter_gan.init_variables(cfg, jax.random.PRNGKey(0), b0)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    coarse_sd = {k[len("coarse_model."):]: v for k, v in init_sd.items()
                 if k.startswith("coarse_model.")}
    params["coarse_model"], batch_stats["coarse_model"] = (
        torch_port.port_vaehrnet(coarse_sd, params["coarse_model"],
                                 batch_stats.get("coarse_model", {})))
    disc_sd = {k[len("frame_disc_model."):]: v for k, v in init_sd.items()
               if k.startswith("frame_disc_model.")}
    params["frame_disc_model"], batch_stats["frame_disc_model"] = (
        torch_port.port_frame_sn_disc(
            disc_sd, params["frame_disc_model"],
            batch_stats.get("frame_disc_model", {})))
    variables = {"params": params, "batch_stats": batch_stats}

    vgg_params = init_vgg_frozen(cfg, jax.random.PRNGKey(1))
    vgg_params = load_torch_vgg19_state(vgg_params, vgg_sd)

    state = state_lib.create_train_state(cfg, variables,
                                         frozen={"vgg": vgg_params})
    train_step = jax.jit(inter_gan.make_train_step(cfg))

    # fixed-eps injection: patch jax.random.normal during the FIRST call
    # (the trace bakes the constant into the compiled step; mirror of the
    # torch-side reparameterize patch)
    eps_j = jnp.asarray(eps)
    orig_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if tuple(shape) == tuple(eps_j.shape):
            return eps_j.astype(dtype)
        return orig_normal(key, shape, dtype)

    rng = jax.random.PRNGKey(0)
    step_records = []
    jax.random.normal = fake_normal
    try:
        for i, batch in enumerate(batches):
            if i >= steps:
                break
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, loss_dict = train_step(state, jb, rng)
            step_records.append({k: float(v) for k, v in loss_dict.items()})
    finally:
        jax.random.normal = orig_normal
    return {"steps": step_records, "state": state}


# ---------------------------------------------------------------------------
# EXTRA variant: ExtraTrainer's autoregressive rollout at num_pred_step=2
# (argmax -> one-hot seg feedback, BPTT through predicted rgb;
# ExtraTrainer.py:254-323).  The reference's own loop references the
# undefined names out_img/out_seg at the window slide (ExtraTrainer.py:
# 306-310 — NameError at num_pred_step>1); the documented fix our
# framework implements (train/extra.py docstring) is applied as a source
# patch so the reference loop can actually run: the feedback frames are
# the coarse outputs.
# ---------------------------------------------------------------------------

_EXTRA_BUG_PATCHES = (
    ("back_img = inpainted_img if self.args.inpaint else out_img",
     "back_img = inpaint_img if self.args.inpaint else coarse_img"),
    ("torch.eye(20)[out_seg.argmax(dim=1)]",
     "torch.eye(20)[coarse_seg.argmax(dim=1)]"),
    # RGBLoss has no 'sharp' kwarg (losses.py:214) — ExtraTrainer.py:65
    # TypeErrors at construction; drop the stale argument
    ("RGBLoss(args, sharp=False)", "RGBLoss(args)"),
    # the ce record key is an annotation-expression, not an assignment
    # (ExtraTrainer.py:189 `d[...]:0`) — the key never lands in the dict
    # and update_loss_record_dict KeyErrors on the first step
    ("d['{}_frame_{}_coarse_ce_loss_record'.format(prefix, i+1)]:0",
     "d['{}_frame_{}_coarse_ce_loss_record'.format(prefix, i+1)] = 0"),
)


def build_argv_extra(h, w, bs):
    return ["--dataset", "cityscape", "--mode", "xs2xs", "--syn_type",
            "extra", "--input_h", str(h), "--input_w", str(w),
            "--bs", str(bs), "--epochs", "1", "--split", "train",
            "--nw", "0", "--disp_interval", "10000", "--vid_len", "2",
            "EXTRA", "--model", "ExtraNet", "--train_coarse",
            "--num_pred_step", "2"]


def run_reference_extra(argv, fixture, steps):
    torch = _install_torch_stubs()
    mod = _load_ref_module("ExtraTrainer.py", "_ref_extratrainer",
                           text_subs=_EXTRA_BUG_PATCHES)
    mod.dist = types.SimpleNamespace(all_reduce=lambda t, *a, **k: None)
    mod.get_dataset = lambda args: _make_ref_datasets(torch, fixture, 4)

    workdir = tempfile.mkdtemp(prefix="trajparity_extra_")
    os.makedirs(os.path.join(workdir, "checkpoint"), exist_ok=True)
    args = _ref_args(argv, workdir)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    trainer = mod.ExtraTrainer(args)
    trainer.writer = _Recorder()
    trainer.prepare_image_set = lambda *a, **k: torch.zeros(3, 4, 4)

    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in trainer.model.module.state_dict().items()}
    vgg_sd = {k: v.detach().cpu().numpy().copy()
              for k, v in trainer.RGBLoss.vgg_loss.vgg_net.vgg
              .state_dict().items()}

    trainer.set_epoch(0)
    trainer.train()
    final_sd = {k: v.detach().cpu().numpy().copy()
                for k, v in trainer.model.module.state_dict().items()}
    return {"init_sd": init_sd, "vgg_sd": vgg_sd,
            "steps": trainer.writer.steps[:steps], "final_sd": final_sd}


def _our_batches_n(frames, segs, bs, n_frames):
    n = (len(frames) // bs) * bs
    eye = np.eye(N_CLASSES, dtype=np.float32)
    for i in range(0, n, bs):
        batch = {}
        for t in range(n_frames):
            batch[f"frame{t + 1}"] = frames[i:i + bs, t]
            batch[f"seg{t + 1}"] = eye[segs[i:i + bs, t]]
        yield batch


def run_ours_extra(argv, fixture, init_sd, vgg_sd, steps):
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.cli.options import (
        parse_args,
    )
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.models.features import (
        load_torch_vgg19_state,
    )
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_hrnet,
    )
    from deep_video_interpolation_extrapolation_tpu.train import (
        extra as extra_lib,
        state as state_lib,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        init_vgg_frozen,
    )

    sub = argv.index("EXTRA")
    cfg = parse_args(argv[:sub] + ["--compute_dtype", "float32"]
                     + argv[sub:])
    model = registry.build_model(cfg)

    h, w = cfg.input_h, cfg.input_w
    x0 = jnp.zeros((cfg.batch_size, h, w, 6), jnp.float32)
    s0 = jnp.zeros((cfg.batch_size, h, w, 2 * N_CLASSES), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x0, s0, train=False))

    coarse_sd = {k[len("coarse_model."):]: v for k, v in init_sd.items()
                 if k.startswith("coarse_model.")}
    params = dict(variables["params"])
    params["coarse_model"] = port_hrnet(coarse_sd, params["coarse_model"])
    variables["params"] = params

    vgg_params = init_vgg_frozen(cfg, jax.random.PRNGKey(1))
    vgg_params = load_torch_vgg19_state(vgg_params, vgg_sd)

    state = state_lib.create_train_state(cfg, variables,
                                         frozen={"vgg": vgg_params})
    train_step = jax.jit(extra_lib.make_train_step(cfg, model))

    rng = jax.random.PRNGKey(0)
    step_records = []
    for i, batch in enumerate(_our_batches_n(
            fixture["train_frames"], fixture["train_segs"],
            cfg.batch_size, 4)):
        if i >= steps:
            break
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss_dict = train_step(state, jb, rng)
        step_records.append({k: float(v) for k, v in loss_dict.items()})
    return {"steps": step_records, "state": state}


# ---------------------------------------------------------------------------
# final-weight oracle: port the reference's POST-TRAINING state_dict with
# the same porters used for init and compare leaf-by-leaf with our final
# params — a far stronger trajectory pin than loss curves alone (it sees
# every optimizer moment integrated over the run).
# ---------------------------------------------------------------------------


def compare_final_params(variant, final_sd, our_state):
    import jax

    from deep_video_interpolation_extrapolation_tpu.tools import torch_port

    out = {}

    def rel_l2(name, ported, ours):
        num = den = 0.0
        rows = []
        flat_p = jax.tree_util.tree_flatten_with_path(ported)[0]
        flat_o = jax.tree_util.tree_leaves(ours)
        for (path, a), b in zip(flat_p, flat_o):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            num += float(((a - b) ** 2).sum())
            den += float((a ** 2).sum())
            scale = max(np.abs(a).max(), 1e-8)
            leaf_rel_l2 = float(np.sqrt(
                ((a - b) ** 2).sum() / max((a ** 2).sum(), 1e-30)))
            rows.append((float(np.abs(a - b).max() / scale), leaf_rel_l2,
                         "/".join(str(getattr(p, "key", p)) for p in path)))
        rows.sort(reverse=True)
        # BatchNorm scale/bias have STRUCTURALLY near-zero gradients (a
        # constant shift/scale into the next layer's BN is re-normalized
        # away, the lrelu between leaving only a residue): Adamax's
        # sign-normalized updates turn cross-framework f32 noise on them
        # into full-lr steps in arbitrary directions.  Report the
        # aggregate with and without them.
        num_ex = den_ex = 0.0
        for (path, a), b in zip(flat_p, flat_o):
            pstr = "/".join(str(getattr(p, "key", p)) for p in path)
            if "BatchNorm" in pstr:
                continue
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            num_ex += float(((a - b) ** 2).sum())
            den_ex += float((a ** 2).sum())
        out[name] = {"rel_l2": float(np.sqrt(num / max(den, 1e-30))),
                     "rel_l2_ex_bn": float(np.sqrt(
                         num_ex / max(den_ex, 1e-30))),
                     "worst_leaf_maxrel": rows[0][0] if rows else 0.0,
                     "worst_leaves": [
                         {"leaf": r[2], "maxrel": round(r[0], 5),
                          "rel_l2": round(r[1], 5)} for r in rows[:6]]}

    p = jax.device_get(our_state.params)
    bs = jax.device_get(our_state.batch_stats or {})
    coarse_sd = {k[len("coarse_model."):]: v for k, v in final_sd.items()
                 if k.startswith("coarse_model.")}
    if variant == "gan":
        ported, ported_bs = torch_port.port_vaehrnet(
            coarse_sd, p["coarse_model"], bs.get("coarse_model", {}))
        rel_l2("coarse_model", ported, p["coarse_model"])
        rel_l2("coarse_model_bn_stats", ported_bs, bs["coarse_model"])
        disc_sd = {k[len("frame_disc_model."):]: v
                   for k, v in final_sd.items()
                   if k.startswith("frame_disc_model.")}
        ported_d, ported_dbs = torch_port.port_frame_sn_disc(
            disc_sd, p["frame_disc_model"], bs.get("frame_disc_model", {}))
        rel_l2("frame_disc_model", ported_d, p["frame_disc_model"])
        # SN u vectors: drop the sigma entries (recomputed, not state)
        rel_l2("frame_disc_sn_u", _strip_sigma(ported_dbs),
               _strip_sigma(bs["frame_disc_model"]))
    else:
        ported = torch_port.port_hrnet(coarse_sd, p["coarse_model"])
        rel_l2("coarse_model", ported, p["coarse_model"])
    return out


def _strip_sigma(tree):
    if isinstance(tree, dict):
        return {k: _strip_sigma(v) for k, v in tree.items()
                if not k.endswith("sigma")}
    return tree


def run_variant(variant, h, w, bs, steps, val_batches=4):
    """Run one variant end to end; returns (ref, ours, comparison dict)."""
    if variant == "inter":
        fixture = make_fixture(steps * bs, val_batches * bs, h, w)
        argv = build_argv(h, w, bs)
        ref = run_reference(argv, fixture, steps)
        ours = run_ours(argv, fixture, ref["init_sd"], ref["vgg_sd"], steps)
    elif variant == "gan":
        fixture = make_fixture(steps * bs, val_batches * bs, h, w)
        argv = build_argv_gan(h, w, bs)
        eps = make_gan_eps(bs)
        ref = run_reference_gan(argv, fixture, steps, eps)
        ours = run_ours_gan(argv, fixture, ref["init_sd"], ref["vgg_sd"],
                            steps, eps)
    elif variant == "extra":
        fixture = make_fixture(steps * bs, val_batches * bs, h, w,
                               n_frames=4)
        argv = build_argv_extra(h, w, bs)
        ref = run_reference_extra(argv, fixture, steps)
        ours = run_ours_extra(argv, fixture, ref["init_sd"],
                              ref["vgg_sd"], steps)
    else:
        raise KeyError(variant)
    cmp_ = compare(ref, ours)
    if "final_sd" in ref and "state" in ours:
        cmp_["final_params"] = compare_final_params(
            variant, ref["final_sd"], ours["state"])
    return argv, ref, ours, cmp_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="inter",
                    choices=("inter", "gan", "extra"))
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--hw", default=None,
                    help="HxW; defaults: inter/extra 64,128 — gan 128,128 "
                         "(the SN disc head hard-codes 128x128)")
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--val-batches", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    hw = args.hw or ("128,128" if args.variant == "gan" else "64,128")
    h, w = (int(v) for v in hw.split(","))
    out = args.out or (
        "docs/TRAJPARITY_r4.json" if args.variant == "inter"
        else f"docs/TRAJPARITY_{args.variant.upper()}_r5.json")

    argv, ref, ours, cmp_ = run_variant(args.variant, h, w, args.bs,
                                        args.steps, args.val_batches)
    artifact = {
        "config": {"variant": args.variant, "hw": [h, w], "bs": args.bs,
                   "steps": args.steps, "argv": argv},
        "comparison": cmp_,
        "ref_first_last": [ref["steps"][0], ref["steps"][-1]],
        "our_first_last": [ours["steps"][0], ours["steps"][-1]],
    }
    if "val" in ref:
        artifact["ref_val"] = ref["val"]
        artifact["our_val"] = ours.get("val", {})
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "metric": f"traj_parity_{args.variant}_max_rel_loss_all",
        "value": cmp_["max_rel_per_key"].get("loss_all"),
        "final_step_rel": cmp_["final_step_rel"].get("loss_all"),
        "val_rel": cmp_.get("val_rel", {}),
        "final_params": cmp_.get("final_params", {}),
        "ref_loss_first_last": [ref["steps"][0]["loss_all"],
                                ref["steps"][-1]["loss_all"]],
        "our_loss_first_last": [ours["steps"][0]["loss_all"],
                                ours["steps"][-1]["loss_all"]],
    }))


if __name__ == "__main__":
    main()
