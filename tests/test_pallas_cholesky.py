"""Pallas fused partial-Cholesky kernels vs the XLA reference kernels.

Runs in interpreter mode on CPU (the same kernel code lowers to Mosaic on
TPU; chip-level parity was verified on a v5e — see PROFILE_r03.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.inference import kernels
from gtsam_petercdev_tpu.ops import cholesky as pch


@pytest.mark.parametrize(
    "B,nf,ns,d",
    [(3, 2, 1, 6), (4, 1, 0, 6), (2, 4, 3, 6), (5, 3, 2, 3)],
)
def test_dense_variant_matches_xla(B, nf, ns, d, rng):
    m = (nf + ns) * d
    A = rng.standard_normal((B, m, m + 4))
    Fm = jnp.asarray(A @ A.transpose(0, 2, 1) + 1e-3 * np.eye(m))
    gm = jnp.asarray(rng.standard_normal((B, m)))
    ref = kernels.partial_cholesky(Fm, gm, nf, d)
    got = pch.partial_cholesky(Fm, gm, nf, d, interpret=True)
    for k in ("L", "Linv", "W", "y", "U", "ug"):
        r, g2 = np.asarray(ref[k]), np.asarray(got[k])
        if r.size:
            np.testing.assert_allclose(g2, r, atol=1e-8, err_msg=k)
    assert int(ref["bad"]) == int(got["bad"])


@pytest.mark.parametrize("B,nf,ns,d", [(3, 2, 1, 6), (2, 4, 3, 6)])
def test_blocks_variant_matches_xla(B, nf, ns, d, rng):
    mb = nf + ns
    m = mb * d
    A = rng.standard_normal((B, m, m + 4))
    Fm = jnp.asarray(A @ A.transpose(0, 2, 1) + 1e-3 * np.eye(m))
    gm = jnp.asarray(rng.standard_normal((B, m)))
    ref = kernels.partial_cholesky(Fm, gm, nf, d)
    Fb = (
        np.asarray(Fm)
        .reshape(B, mb, d, mb, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * mb * mb, d, d)
    )
    gb = np.asarray(gm).reshape(B, mb, d)
    got = pch.partial_cholesky_blocks(
        jnp.asarray(Fb), jnp.asarray(gb), nf, ns, d, interpret=True
    )
    for k in ("L", "Linv", "y"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-8, err_msg=k
        )
    if ns:
        Ub_ref = (
            np.asarray(ref["U"])
            .reshape(B, ns, d, ns, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, ns * ns, d, d)
        )
        np.testing.assert_allclose(
            np.asarray(got["U_blocks"]), Ub_ref, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got["ug_blocks"]),
            np.asarray(ref["ug"]).reshape(B, ns, d),
            atol=1e-8,
        )


def test_clamped_pivot_counting(rng):
    """Indefinite frontal blocks: clamped pivots are counted identically."""
    B, nf, ns, d = 2, 2, 1, 3
    m = (nf + ns) * d
    A = rng.standard_normal((B, m, m))
    Fm = np.asarray(A @ A.transpose(0, 2, 1))
    Fm[0, 0, 0] = -5.0  # force a bad pivot
    gm = jnp.asarray(rng.standard_normal((B, m)))
    ref = kernels.partial_cholesky(jnp.asarray(Fm), gm, nf, d)
    got = pch.partial_cholesky(jnp.asarray(Fm), gm, nf, d, interpret=True)
    assert int(got["bad"]) == int(ref["bad"]) >= 1


def test_v2_bucket_kernel_interpret_parity():
    """v2 (whole-bucket, batch-in-VMEM) kernel matches the XLA reference in
    interpret mode across shapes incl. ns=0 leaves. Mosaic lowering through
    the remote compile tunnel is a round-5 item (PROFILE_r04.md)."""
    import numpy as np
    import jax.numpy as jnp

    from gtsam_petercdev_tpu.inference import kernels
    from gtsam_petercdev_tpu.ops import cholesky_v2

    rng = np.random.default_rng(1)
    for (B, nf, ns, d) in [(5, 2, 4, 6), (3, 12, 16, 6), (2, 4, 0, 3)]:
        m = (nf + ns) * d
        A = rng.standard_normal((B, m, m)).astype(np.float32)
        Fm = jnp.asarray(A @ A.transpose(0, 2, 1) + m * np.eye(m, dtype=np.float32))
        gm = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
        ov = cholesky_v2.partial_cholesky(Fm, gm, nf, d, interpret=True)
        oj = kernels.partial_cholesky(Fm, gm, nf, d)
        for k in ["L", "Linv", "W", "y", "U", "ug"]:
            if oj[k].size:
                np.testing.assert_allclose(
                    np.asarray(ov[k]), np.asarray(oj[k]), atol=2e-4
                )
