"""Architecture parity via exact parameter counts.

The reference's experiment log records exact capacities for three models
(reference cmd:7-11, mirrored in BASELINE.md).  Matching them parameter-
for-parameter pins our re-implementations to the reference architectures
without needing its weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.models.legacy_gen import MyFRRN
from deep_video_interpolation_extrapolation_tpu.models.srn_legacy import (
    AttnRefine,
    SRN4,
)


def _count(m, *args, **kw):
    # eval_shape: no compilation or compute — just the param tree shapes
    v = jax.eval_shape(lambda *a: m.init(jax.random.PRNGKey(0), *a, **kw),
                       *args)
    return int(sum(np.prod(l.shape)
                   for l in jax.tree_util.tree_leaves(v["params"])))


def test_myfrrn_param_count():
    rgb = jnp.zeros((1, 16, 32, 6))
    seg = jnp.zeros((1, 16, 32, 40))
    assert _count(MyFRRN(mode="xs2xs", dtype=jnp.float32), rgb, seg) == 1_382_814


def test_srn4_param_count():
    x = jnp.zeros((1, 16, 32, 3))
    assert _count(SRN4(n_scales=1, dtype=jnp.float32), x) == 7_323_875


def test_attn_refine_param_count():
    x = jnp.zeros((1, 16, 32, 3))
    nb = jnp.zeros((1, 16, 32, 6))
    assert _count(AttnRefine(dtype=jnp.float32), x, neighbors=nb) == 693_923
