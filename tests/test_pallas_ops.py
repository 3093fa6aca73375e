"""Pallas kernel correctness via the interpreter (CPU).

The hosted TPU tunnel in this environment cannot compile Mosaic kernels,
so the kernels are validated in interpret mode against the jnp reference;
on real TPU runtimes the same kernels lower natively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.models.integral import heatmap_expectations
from hrpe_tpu.ops.pallas.integral_decode import fused_heatmap_expectations


def test_fused_decode_matches_reference():
    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.randn(3, 7, 8 * 8 * 8).astype(np.float32) * 3)
    ref = heatmap_expectations(hm, (8, 8, 8))
    out = fused_heatmap_expectations(hm, (8, 8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_fused_decode_row_padding():
    # B*K = 5 is not a multiple of the 8-row tile; padding path must hold
    rng = np.random.RandomState(1)
    hm = jnp.asarray(rng.randn(5, 1, 4 * 4 * 8).astype(np.float32))
    ref = heatmap_expectations(hm, (4, 4, 8))
    out = fused_heatmap_expectations(hm, (4, 4, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
