"""The scaling model is machine-checked: the analytic collective replay of
one MG-CG iteration (utils.scaling.mgcg_iteration_model) must match the
census of the actually-compiled while body on the virtual 8-device mesh —
then its efficiency predictions are exercised at the BASELINE config-#5
rungs (VERDICT r3 item 7: make the >=80% weak-scaling north star a
falsifiable prediction instead of an unknown).

Reference anchor: the width-1 halo traffic contract of DMDA
(reference src/poissbox.f90:104-105) and the `mpirun -n 3` scaling story
(reference README.md:25-33).
"""

import jax
import jax.numpy as jnp
import pytest

from poissbox_tpu.utils.scaling import (
    ICI_BW,
    mgcg_iteration_model,
    predict_efficiency,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device test mesh")


def _body_census(n, pgrid):
    from poissbox_tpu.config import SolverOptions
    from poissbox_tpu.mesh import Grid3D, make_device_mesh
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.ksp import make_solver
    from poissbox_tpu.utils.census import census, while_bodies

    mesh = make_device_mesh(pgrid)
    gm = Grid3D((n, n, n)).with_mesh(mesh=mesh)
    A = make_laplacian_operator(gm)
    opts = SolverOptions(ksp_type="cg", pc_type="mg", ksp_rtol=1e-6,
                         ksp_max_it=20)
    solve = make_solver(A, opts, grid=gm, dtype=jnp.float32)
    spec = jax.ShapeDtypeStruct(
        (n, n, n), jnp.float32,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    hlo = jax.jit(lambda b: solve(b).x).lower(spec).compile().as_text()
    for body in while_bodies(hlo):
        c = census(hlo, computation=body)
        if c.get("collective-permute"):
            return c
    raise AssertionError("no while body with permutes found")


@pytest.mark.slow
@pytest.mark.parametrize("pgrid", [(4, 2, 1), (2, 2, 2)])
def test_scaling_model_matches_census(pgrid):
    """Analytic per-iteration permute count/bytes == compiled reality.

    Tolerance: the model is exact on the halo exchanges and roll
    transfers; XLA adds a handful of plane-sized permutes around the
    replicated-tail transition (observed: +4 permutes / +128 B of 454 KB
    on (4,2,1)), so the gate is 3% bytes / 8 permutes — tight enough that
    an accidental extra exchange per level (the smallest real regression,
    ~+10% bytes) trips it.
    """
    n = 64
    got = _body_census(n, pgrid)["collective-permute"]
    want = mgcg_iteration_model((n, n, n), pgrid)
    assert abs(got["count"] - want.permute_count) <= 8, (got, want)
    assert abs(got["bytes"] - want.permute_bytes) <= 0.03 * want.permute_bytes, (
        got, want)


def test_model_scales_with_grid():
    from poissbox_tpu.solvers.mg import MGConfig

    cfg = MGConfig(pre_smooth=1, post_smooth=1)  # pin the cycle: the auto
    # sweep counts are size-aware and would confound the scaling contract
    # doubling the grid at fixed pgrid quadruples face bytes (weak-scaling
    # invariance of the per-device halo volume is over LOCAL size, which
    # this doubles)
    a = mgcg_iteration_model((64, 64, 64), (2, 2, 2), cfg)
    b = mgcg_iteration_model((128, 128, 128), (2, 2, 2), cfg)
    assert b.permute_bytes > 3.5 * a.permute_bytes
    # fixed local size: per-device fine-level face bytes identical on a
    # bigger mesh (the weak-scaling contract); the deeper hierarchy adds
    # only small coarse-level faces
    w1 = mgcg_iteration_model((128, 128, 128), (2, 2, 2), cfg)
    w2 = mgcg_iteration_model((256, 256, 256), (4, 4, 4), cfg)
    assert w2.axis_bytes[0] == pytest.approx(w1.axis_bytes[0], rel=0.25)


def test_weak_scaling_prediction_512_per_chip():
    """BASELINE config #5's rungs as falsifiable numbers: 512^3 per chip,
    v5e ICI, measured single-chip iteration time (BENCH_512: 27.6 ms/it).
    The >=80% north star must hold with margin in BOTH the overlapped and
    the no-overlap accounting at 8 and 64 chips."""
    t_it = 27.6e-3
    for pgrid in [(2, 2, 2), (4, 4, 4)]:
        n = tuple(512 * p for p in pgrid)
        pred = predict_efficiency(n, pgrid, t_it, chip="v5e")
        assert pred.comm_s < 2e-3, pred          # ~1 MB faces over 45 GB/s
        assert pred.efficiency_overlapped >= 0.95, pred
        assert pred.efficiency_serial >= 0.80, pred


def test_strong_scaling_prediction_512_over_8():
    # strong: 512^3 split over 8 chips; compute scales by the block ratio
    t_it = 27.6e-3 / 8
    pred = predict_efficiency((512, 512, 512), (2, 2, 2), t_it, chip="v5e")
    assert pred.efficiency_overlapped >= 0.85, pred


def test_ici_table_sane():
    assert ICI_BW["v5e"] == 4.5e10 and ICI_BW["v5p"] > ICI_BW["v5e"]
