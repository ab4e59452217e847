"""Cityscapes clip dataset (reference folder.py:38-313).

Host-side numpy/PIL pipeline producing fixed-shape batches:

- 3-frame (or vid_len+2) clips of rgb (normalized to [-1,1] with mean/std
  0.5, folder.py:187-191) and 20-class one-hot seg (folder.py:195);
- train-time correlated crop-motion augmentation: the per-frame crops drift
  linearly across the clip, simulating camera motion
  (folder.py:125-149,183-194), plus horizontal flip (folder.py:166-180);
- bbox tracks: input pkl rows [score, x1, y1, x2, y2] at 1024x512 are
  rescaled to image scale and converted to (y1, x1, y2, x2)
  (folder.py:108-123), crop/flip-adjusted and clamped, degenerate tracks
  dropped, missing tracks re-sampled by duplication, and clips with no
  usable track resampled (folder.py:219-276).

Deviation: batches carry boxes as (3, n_track, 4) float (y1, x1, y2, x2);
the reference keeps the score as a 5th leading field that no model consumes
spatially (TrackGen indexes fields 1..4, nets/TrackGen.py:137-144).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
    IMG_EXT,
    SEG_EXT,
    N_CLASSES,
)
from deep_video_interpolation_extrapolation_tpu.native import host as _native


def _decode_rgb(data: bytes) -> np.ndarray:
    import io
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)


def _decode_seg(data: bytes) -> np.ndarray:
    import io
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(data)).convert("L"), np.uint8)


def _pil_frame_rgb(data: bytes, flip: bool, y0: int, x0: int,
                   ch: int, cw: int) -> np.ndarray:
    """PIL-semantics fallback for one frame the native decoder declined."""
    arr = _decode_rgb(data)
    if flip:
        arr = arr[:, ::-1]
    arr = arr[y0:y0 + ch, x0:x0 + cw]
    return arr.astype(np.float32) / 255.0 * 2.0 - 1.0


def _pil_frame_seg(data: bytes, flip: bool, y0: int, x0: int,
                   ch: int, cw: int) -> np.ndarray:
    arr = _decode_seg(data)
    if flip:
        arr = arr[:, ::-1]
    arr = arr[y0:y0 + ch, x0:x0 + cw]
    return np.eye(N_CLASSES, dtype=np.float32)[arr]


def correlated_crop_params(rng: np.random.RandomState, src: int, crop: int):
    """Linear-drift crop offsets for a 3-frame clip (folder.py:125-149)."""
    margin = src - crop
    assert margin >= 0, (src, crop)
    if margin == 0:   # crop == source: no room to drift
        return 0, 0, 0
    interval = rng.randint(margin)
    direction = rng.randint(2)
    mid = rng.randint(interval // 2, margin - interval // 2)
    if direction == 1:
        first, last = mid - interval // 2, mid + interval // 2
    else:
        first, last = mid + interval // 2, mid - interval // 2
    return first, mid, last


class ClipDataset:
    """Fixed-shape clip sampler (reference ImageFolder/DatasetFolder)."""

    def __init__(
        self,
        cfg,
        clips: Sequence[Sequence[str]],
        bboxes: Optional[List] = None,
        split: str = "train",
        img_dir: Optional[str] = None,
        seg_dir: Optional[str] = None,
        src_size: Optional[int] = None,
        seg_ids: bool = False,
    ):
        self.cfg = cfg
        self.clips = list(clips)
        self.split = split
        # seg_ids: emit (H, W) uint8 class ids instead of the f32 one-hot
        # (H, W, 20) — 80x fewer bytes to stack, queue, and ship to the
        # device; the jitted train steps one-hot on device (seg_oh,
        # train/common.py).  Bit-identical end to end.
        self.seg_ids = bool(seg_ids)
        self.img_dir = img_dir or cfg.img_dir
        self.seg_dir = seg_dir or cfg.seg_dir
        # reference: 150px train source, 128px val source (folder.py:85-98)
        self.src_size = src_size or (150 if split == "train" else 128)
        self.vid_len = len(self.clips[0]) if self.clips else 3
        self.bboxes = self._convert(bboxes) if bboxes is not None else None
        # tri-state native-decodability cache: None = unprobed, False =
        # this tree declined once (skip probes forever), True = decodable
        self._native_ok = None

    def __len__(self):
        return len(self.clips)

    def _convert(self, clips_boxes):
        """Rescale 1024x512 [score,x1,y1,x2,y2] -> img-scale (y1,x1,y2,x2)
        keeping score (folder.py:108-123)."""
        out = []
        s = self.src_size
        for clip in clips_boxes:
            cb = []
            for frame in clip:
                fb = []
                for box in frame:
                    if box is None:
                        fb.append(None)
                        continue
                    score, x1, y1, x2, y2 = box
                    x1 = np.floor(x1 * s / 1024.0)
                    y1 = np.floor(y1 * s / 512.0)
                    x2 = np.floor(x2 * s / 1024.0)
                    y2 = np.floor(y2 * s / 512.0)
                    if y2 <= y1 or x2 <= x1:
                        fb.append(None)
                    else:
                        fb.append([score, y1, x1, y2, x2])
                cb.append(fb)
            out.append(cb)
        return out

    def sample(self, index: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        for _attempt in range(16):
            item = self._try_sample(index, rng)
            if item is not None:
                return item
            if len(self.clips) > 1:
                index = (index + rng.randint(1, len(self.clips))) % len(self.clips)
        raise RuntimeError("no clip with usable tracks after 16 resamples")

    @staticmethod
    def _check_ids(ids: np.ndarray) -> np.ndarray:
        """ids mode keeps the one-hot path's loud-failure contract: an id
        >= N_CLASSES raises (np.eye's IndexError) instead of becoming a
        silent all-zero row in the on-device jax.nn.one_hot."""
        if ids.max(initial=0) >= N_CLASSES:
            raise IndexError(
                f"seg id {int(ids.max())} >= N_CLASSES ({N_CLASSES})")
        return np.ascontiguousarray(ids)

    def _native_dims(self, img_bytes, seg_bytes):
        """(h, w) when EVERY frame is natively decodable (8-bit RGB/gray,
        non-interlaced PNG); None -> PIL pipeline.  A dataset that ever
        declines is remembered (``_native_ok``) so non-PNG trees do not
        pay the header probes every sample."""
        if self._native_ok is False or not _native.available():
            return None
        dims = _native.native_decodable(img_bytes[0], 3)
        if dims is None:
            self._native_ok = False
            return None
        if self._native_ok is None:
            # first sample decides for the tree; afterwards only frame 0
            # is probed (for this clip's dims) — ~6 redundant libpng
            # header parses per sample saved on the steady-state hot
            # path.  A stray odd frame later is still safe: each decode
            # call validates its own header and declines to the PIL
            # fallback per frame.
            ok = (all(_native.native_decodable(b, 3) == dims
                      for b in img_bytes[1:])
                  and all(_native.native_decodable(b, 1) == dims
                          for b in seg_bytes))
            self._native_ok = ok
            return dims if ok else None
        return dims

    def _try_sample(self, index, rng):
        cfg = self.cfg
        clip = self.clips[index]
        # read each file ONCE; both decode branches work from the bytes
        img_bytes = [
            open(os.path.join(self.img_dir, p + IMG_EXT), "rb").read()
            for p in clip
        ]
        seg_bytes = [
            open(os.path.join(self.seg_dir, p + SEG_EXT), "rb").read()
            for p in clip
        ]
        # native fast path: fused decode+flip+crop+normalize/one-hot in C
        # (single pass over the bytes, GIL-free under the worker pool);
        # bit-identical to the PIL/numpy branch below.  Pixel decode is
        # DEFERRED past the bbox validity check: a clip rejected for
        # losing every track to the crop (-> resample) costs only header
        # reads, never full decodes.
        nat = self._native_dims(img_bytes, seg_bytes)
        if nat is None:
            import io

            from PIL import Image
            # header-only: PIL defers pixel decode until .load()
            w0, h0 = Image.open(io.BytesIO(img_bytes[0])).size
            src_h, src_w = h0, w0
        else:
            src_h, src_w = nat
        n_track = cfg.num_track_per_img
        if self.bboxes is not None:
            # the bbox contract is square src_size trees (the reference's
            # 150-train/128-val dirs): _convert scales pkl boxes by
            # src_size/1024|512 and flip reflects about src_size-1.  A
            # mismatched tree would silently mis-scale every box, so
            # validate against the dims the images actually decode to.
            if not (src_h == src_w == self.src_size):
                raise ValueError(
                    f"bbox tracks need square {self.src_size}px frames, "
                    f"got {src_h}x{src_w} — pass the matching "
                    "--img_dir/--seg_dir tree or src_size")
            clip_boxes = [
                [None if b is None else list(b) for b in frame]
                for frame in self.bboxes[index]
            ]
        else:
            clip_boxes = None

        flip = rng.randint(0, 3) and self.split == "train"
        if flip:
            if clip_boxes is not None:
                w_last = self.src_size - 1
                for frame in clip_boxes:
                    for b in frame:
                        if b is not None:
                            b[2], b[4] = w_last - b[4], w_last - b[2]

        ch, cw = cfg.input_h, cfg.input_w
        if self.split == "train":
            hs = correlated_crop_params(rng, src_h, ch)
            ws = correlated_crop_params(rng, src_w, cw)
            crops = [(hs[i], ws[i]) for i in range(min(3, self.vid_len))]
            # clips longer than 3 frames (deep extrapolation rollouts):
            # continue the per-step linear drift, clamped to the valid
            # range, so the simulated camera motion spans the whole clip.
            # (The reference CRASHES here: get_seq_crop_params returns a
            # 3-tuple and folder.py:189 indexes it with frame 4+ —
            # consistent with deep-rollout training being stale, SURVEY
            # §2.7.)
            while len(crops) < self.vid_len:
                (h2, w2), (h1, w1) = crops[-1], crops[-2]
                crops.append((
                    int(np.clip(2 * h2 - h1, 0, src_h - ch)),
                    int(np.clip(2 * w2 - w1, 0, src_w - cw)),
                ))
        else:
            crops = [(0, 0)] * self.vid_len

        # bbox adjust + validity filtering (folder.py:219-276) — runs
        # BEFORE pixel decode (it needs only crops + boxes), so a
        # rejected clip skips the decode work entirely.  RNG draw order
        # (flip -> crops -> duplication) is unchanged.
        if clip_boxes is not None:
            kept = [[], [], []]
            # the pkls keep clips with >= 1 passing track, capped at but
            # never padded to num_box — iterate the tracks that exist;
            # scarcity is handled by the duplication loop below
            for j in range(min(n_track, len(clip_boxes[0]))):
                track = []
                ok = True
                for i in range(3):
                    b = clip_boxes[i][j]
                    if b is None:
                        ok = False
                        break
                    y0, x0 = crops[i] if self.split == "train" else (0, 0)
                    y1 = max(0.0, b[1] - y0)
                    y2 = min(ch - 1.0, b[3] - y0)
                    x1 = max(0.0, b[2] - x0)
                    x2 = min(cw - 1.0, b[4] - x0)
                    if y2 <= y1 or x2 <= x1:
                        ok = False
                        break
                    track.append([y1, x1, y2, x2])
                if ok:
                    for i in range(3):
                        kept[i].append(track[i])
            if len(kept[1]) == 0:
                return None
            while len(kept[1]) < n_track:
                k = rng.randint(len(kept[1]))
                for i in range(3):
                    kept[i].append(list(kept[i][k]))
            boxes = np.asarray(kept, np.float32)
        else:
            boxes = np.tile(
                np.array([0.0, 0.0, ch - 1.0, cw - 1.0], np.float32),
                (3, n_track, 1))

        out: Dict[str, np.ndarray] = {}
        for i in range(self.vid_len):
            y0, x0 = crops[i]
            if nat is not None:
                frame = _native.decode_rgb_norm(
                    img_bytes[i], y0, x0, ch, cw, bool(flip), mode=0)
                # declined frames (e.g. a seg id >= N_CLASSES) re-run
                # under PIL semantics so errors surface identically
                if frame is None:
                    frame = _pil_frame_rgb(
                        img_bytes[i], bool(flip), y0, x0, ch, cw)
                out[f"frame{i + 1}"] = frame
                if self.seg_ids:
                    ids = _native.decode_u8(seg_bytes[i], 1)
                    if ids is None:
                        ids = _decode_seg(seg_bytes[i])
                    if flip:
                        ids = ids[:, ::-1]
                    out[f"seg{i + 1}"] = self._check_ids(
                        ids[y0:y0 + ch, x0:x0 + cw])
                else:
                    onehot = _native.decode_seg_onehot(
                        seg_bytes[i], y0, x0, ch, cw, bool(flip), N_CLASSES)
                    if onehot is None:
                        onehot = _pil_frame_seg(
                            seg_bytes[i], bool(flip), y0, x0, ch, cw)
                    out[f"seg{i + 1}"] = onehot
                continue
            # PIL branch: the same per-frame fused helpers the native
            # path falls back to (decode happens here, post-validation)
            out[f"frame{i + 1}"] = _pil_frame_rgb(
                img_bytes[i], bool(flip), y0, x0, ch, cw)
            if self.seg_ids:
                ids = _decode_seg(seg_bytes[i])
                if flip:
                    ids = ids[:, ::-1]
                out[f"seg{i + 1}"] = self._check_ids(
                    ids[y0:y0 + ch, x0:x0 + cw])
            else:
                out[f"seg{i + 1}"] = _pil_frame_seg(
                    seg_bytes[i], bool(flip), y0, x0, ch, cw)
        out["bboxes"] = boxes
        return out


class TripletDataset:
    """UCF101 / Vimeo-triplet frame datasets (reference data.py:75-137,
    folder.py:99-104,152-156,284-290): xx2x evaluation sets with no
    segmentation — seg slots carry fixed-shape zero one-hots so the jitted
    step keeps a single signature across datasets.

    ``clips`` entries are either 3 frame paths (ucf101 pkl rows) or a single
    triplet dir (vimeo ``tri_*list.txt`` rows, frames ``im1..3.png``).
    """

    def __init__(self, cfg, clips: Sequence, img_dir: str,
                 style: str = "vimeo", resize=None):
        self.cfg = cfg
        self.clips = list(clips)
        self.img_dir = img_dir
        self.style = style
        self.resize = resize  # (w, h) or None
        self._native_ok = None  # see ClipDataset._native_dims

    def __len__(self):
        return len(self.clips)

    def sample(self, index: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        import io

        from PIL import Image
        entry = self.clips[index]
        if self.style == "vimeo":
            paths = [os.path.join(self.img_dir, entry, f"im{i + 1}.png")
                     for i in range(3)]
        else:  # ucf101: explicit 3-frame rows
            paths = [os.path.join(self.img_dir, p) for p in entry]
        out: Dict[str, np.ndarray] = {}
        for i, p in enumerate(paths):
            data = open(p, "rb").read()  # read once; both branches decode
            if (self.resize is None and self._native_ok is not False
                    and _native.available()):
                dims = _native.native_decodable(data, 3)
                frame = (None if dims is None else _native.decode_rgb_norm(
                    data, 0, 0, dims[0], dims[1], False, mode=1))
                self._native_ok = frame is not None
                if frame is not None:
                    out[f"frame{i + 1}"] = frame
                    h, w = frame.shape[:2]
                    out[f"seg{i + 1}"] = np.zeros((h, w, N_CLASSES),
                                                  np.float32)
                    continue
            img = Image.open(io.BytesIO(data)).convert("RGB")
            if self.resize is not None:
                img = img.resize(self.resize, Image.BILINEAR)
            arr = np.asarray(img, np.float32) / 255.0
            out[f"frame{i + 1}"] = (arr - 0.5) / 0.5
            h, w = arr.shape[:2]
            out[f"seg{i + 1}"] = np.zeros((h, w, N_CLASSES), np.float32)
        out["bboxes"] = np.tile(
            np.array([0.0, 0.0, h - 1.0, w - 1.0], np.float32),
            (3, self.cfg.num_track_per_img, 1))
        return out


class Loader:
    """Epoch-seeded shuffling batcher (DistributedSampler.set_epoch
    semantics, runners/InterTrainer.py:117-120) with multi-worker
    prefetching (the reference's ``DataLoader(num_workers=args.nw)``,
    runners/InterTrainer.py:84-87).

    ``num_workers > 0`` decodes/augments samples on a thread pool while a
    producer thread assembles batches into a bounded queue (``prefetch``
    batches deep), overlapping host data work with device compute.
    Augmentation RNG is per-sample — seeded by (seed, epoch, position) —
    so the worker and sequential paths produce IDENTICAL batches and
    same-epoch iteration stays reproducible regardless of thread timing.
    """

    def __init__(self, dataset: ClipDataset, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 0, prefetch: int = 2):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.epoch = 0
        self.num_workers = int(num_workers)
        self.prefetch = max(int(prefetch), 1)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.ds) // self.batch_size
        if not self.drop_last and len(self.ds) % self.batch_size:
            n += 1
        return n

    def _sample_rng(self, pos: int) -> np.random.RandomState:
        # collision-resistant (seed, epoch, position) stream: the earlier
        # linear hash (seed*1000003 + epoch*9176 + pos) aliased across
        # epochs for datasets longer than 9176 samples — (e, 9176+k) and
        # (e+1, k) repeated identical augmentation streams
        ss = np.random.SeedSequence([self.seed, self.epoch, pos])
        return np.random.RandomState(ss.generate_state(4))

    def _order(self) -> np.ndarray:
        rng = np.random.RandomState(self.seed + self.epoch)
        return (rng.permutation(len(self.ds)) if self.shuffle
                else np.arange(len(self.ds)))

    def __iter__(self):
        order = self._order()
        nb = len(self)
        if self.num_workers <= 0:
            for bi in range(nb):
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                samples = [
                    self.ds.sample(int(i), self._sample_rng(
                        bi * self.batch_size + k))
                    for k, i in enumerate(idxs)
                ]
                yield {
                    k: np.stack([s[k] for s in samples]) for k in samples[0]
                }
            return
        yield from self._iter_workers(order, nb)

    def _iter_workers(self, order: np.ndarray, nb: int):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_guarded(item) -> None:
            # every producer put must respect `stop`: an unguarded
            # blocking put strands this thread forever when the consumer
            # abandons the iterator with the bounded queue full
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        def produce(pool):
            try:
                # submit up to prefetch+1 batches of sample futures ahead
                pending = []
                bi_next = 0

                def submit(bi):
                    idxs = order[bi * self.batch_size:
                                 (bi + 1) * self.batch_size]
                    return [pool.submit(
                        self.ds.sample, int(i),
                        self._sample_rng(bi * self.batch_size + k))
                        for k, i in enumerate(idxs)]

                while bi_next < nb and len(pending) <= self.prefetch:
                    pending.append(submit(bi_next))
                    bi_next += 1
                while pending and not stop.is_set():
                    futs = pending.pop(0)
                    samples = [f.result() for f in futs]
                    batch = {k: np.stack([s[k] for s in samples])
                             for k in samples[0]}
                    if bi_next < nb:
                        pending.append(submit(bi_next))
                        bi_next += 1
                    put_guarded(batch)
            except Exception as e:  # surface worker errors to the consumer
                put_guarded(e)
                return
            put_guarded(None)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            t = threading.Thread(target=produce, args=(pool,), daemon=True)
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                stop.set()
