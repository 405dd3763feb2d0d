"""AOT multi-chip TPU compile validation.

The strongest multi-chip readiness check available without hardware:
compile the sharded production kernels for a *virtual 8-chip v5e
topology* (`jax.experimental.topologies`) with the real TPU backend and
assert (a) the Pallas-in-shard_map program compiles, (b) the optimized
schedule overlaps the halo collectives with the Mosaic bulk kernel.

Requires the TPU compiler (libtpu / remote compile service); skipped on
plain-CPU environments. Run with POISSBOX_TEST_PLATFORM=tpu to avoid the
conftest CPU forcing.
"""

import os

import pytest

if os.environ.get("POISSBOX_TEST_PLATFORM", "cpu") != "tpu":
    pytest.skip("AOT TPU compile tests need POISSBOX_TEST_PLATFORM=tpu",
                allow_module_level=True)

import jax  # noqa: E402

# The AOT TPU pipeline is f32/bf16 (x64 turns weakly-typed shift/index
# constants into i64/f64, which Mosaic rejects and the axon remote-compile
# path chokes on); the conftest's global x64 enable must be undone here.
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def topo_devices():
    from jax.experimental import topologies
    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4",
            chips_per_host_bounds=(2, 4, 1))
    except Exception as e:  # no libtpu / no compile service
        pytest.skip(f"TPU topology unavailable: {e}")
    return list(topo.devices)


def _grid(topo_devices, n=64, pgrid=(4, 2, 1)):
    from poissbox_tpu.mesh import Grid3D, make_device_mesh
    mesh = make_device_mesh(pgrid, devices=topo_devices)
    return Grid3D((n, n, n)).with_mesh(mesh=mesh)


def test_sharded_matvec_compiles_with_overlap(topo_devices):
    from poissbox_tpu.parallel.dist_stencil import apply_laplacian_sharded

    gm = _grid(topo_devices, n=256)
    fn = jax.jit(lambda u: apply_laplacian_sharded(u, gm, overlap=True,
                                                   local_impl="pallas"))
    spec = jax.ShapeDtypeStruct(
        (256, 256, 256), jnp.float32,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    hlo = fn.lower(spec).compile().as_text()
    assert "tpu_custom_call" in hlo          # Mosaic kernel survived SPMD
    assert "collective-permute-start" in hlo  # async halos
    # the bulk kernel must run between a start and its done
    lines = hlo.splitlines()
    bulk = next(i for i, ln in enumerate(lines) if "tpu_custom_call" in ln)
    starts = [i for i, ln in enumerate(lines)
              if "collective-permute-start" in ln]
    dones = [i for i, ln in enumerate(lines)
             if "collective-permute-done" in ln]
    assert any(s < bulk for s in starts), "no halo issued before the bulk"
    assert any(d > bulk for d in dones), "no halo consumed after the bulk"


def test_sharded_mgcg_step_compiles(topo_devices):
    from poissbox_tpu.config import SolverOptions
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.ksp import make_solver

    gm = _grid(topo_devices, n=64)
    A = make_laplacian_operator(gm)
    opts = SolverOptions(ksp_type="cg", pc_type="mg", ksp_rtol=1e-6,
                         ksp_max_it=20)
    solve = make_solver(A, opts, grid=gm, dtype=jnp.float32)
    spec = jax.ShapeDtypeStruct(
        (64, 64, 64), jnp.float32,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    compiled = jax.jit(lambda b: solve(b).x).lower(spec).compile()
    hlo = compiled.as_text()
    assert "collective-permute" in hlo  # distributed levels really sharded


def test_pencil_compact_compiles_with_all_to_all(topo_devices):
    """The pencil-transposed compact sweeps (2decomp transpose method)
    must partition for a real TPU target: reshard chains lower to
    all-to-alls (not GSPMD's replicate fallback) and the shard_map-local
    line solves survive SPMD."""
    from poissbox_tpu.ops import compact_dist

    gm = _grid(topo_devices, n=64, pgrid=(2, 2, 2))
    fn = jax.jit(lambda f: compact_dist.lapl(f, gm))
    spec = jax.ShapeDtypeStruct(
        (64, 64, 64), jnp.float32,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    hlo = fn.lower(spec).compile().as_text()
    assert "all-to-all" in hlo, "pencil transposes did not lower to all-to-alls"


# ---------------------------------------------------------------------------
# communication census: collective COUNTS and BYTE VOLUMES of the optimized
# HLO must match the analytic halo/transpose model — the regression that
# catches an accidental gather/replication the moment GSPMD introduces one
# (reference src/poissbox.f90:104-105: the traffic DMDA promises).
# ---------------------------------------------------------------------------

def _compile_hlo(fn, gm, n, dtype=None):
    dtype = dtype or jnp.float32
    spec = jax.ShapeDtypeStruct(
        (n, n, n), dtype,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    return jax.jit(fn).lower(spec).compile().as_text()


def test_matvec_census_exact(topo_devices):
    """One sharded matvec = exactly 2 collective-permutes per sharded
    axis, each one face plane — and NOTHING else (no gather, no
    reduction, no resharding)."""
    from poissbox_tpu.parallel.dist_stencil import apply_laplacian_sharded
    from poissbox_tpu.utils.census import census, halo_model

    n = 256
    gm = _grid(topo_devices, n=n)  # pgrid (4,2,1): local block (64,128,256)
    hlo = _compile_hlo(
        lambda u: apply_laplacian_sharded(u, gm, local_impl="pallas"), gm, n)
    got = census(hlo)
    want = halo_model(gm, itemsize=4)
    assert got.get("collective-permute", {}).get("count") == want["count"]
    assert got.get("collective-permute", {}).get("bytes") == want["bytes"]
    for op in ("all-gather", "all-reduce", "all-to-all", "reduce-scatter"):
        assert op not in got, (op, got)


def test_matvec_dot_census(topo_devices):
    """Fused matvec+dot adds exactly the reduction all-reduce(s) on
    scalars — the halo volume is unchanged."""
    from poissbox_tpu.parallel.dist_stencil import apply_laplacian_dot_sharded
    from poissbox_tpu.utils.census import census, halo_model

    n = 256
    gm = _grid(topo_devices, n=n)
    hlo = _compile_hlo(
        lambda u: apply_laplacian_dot_sharded(u, gm, local_impl="pallas"),
        gm, n)
    got = census(hlo)
    want = halo_model(gm, itemsize=4)
    assert got["collective-permute"]["count"] == want["count"]
    assert got["collective-permute"]["bytes"] == want["bytes"]
    ar = got.get("all-reduce", {"count": 0, "bytes": 0})
    assert 1 <= ar["count"] <= 2          # the psum'd scalar dot
    assert ar["bytes"] <= 16              # scalars only
    assert "all-gather" not in got


def test_smoother_sweep_census(topo_devices):
    """One red-black color update = one halo-exchange set, like the
    matvec (the correction form promises no second exchange for the
    masked update)."""
    from poissbox_tpu.parallel.dist_stencil import sor_sweep_sharded
    from poissbox_tpu.utils.census import census, halo_model

    n = 64
    gm = _grid(topo_devices, n=n)
    spec = jax.ShapeDtypeStruct(
        (n, n, n), jnp.float32,
        sharding=jax.sharding.NamedSharding(gm.mesh, gm.spec))
    hlo = (jax.jit(lambda x, b: sor_sweep_sharded(x, b, gm, 1.0, 0,
                                                  local_impl="pallas"))
           .lower(spec, spec).compile().as_text())
    got = census(hlo)
    want = halo_model(gm, itemsize=4)
    assert got["collective-permute"]["count"] == want["count"]
    assert got["collective-permute"]["bytes"] == want["bytes"]
    assert "all-gather" not in got and "all-reduce" not in got


def test_pencil_lapl_census(topo_devices):
    """compact_dist.lapl must lower to exactly the 2decomp transpose
    schedule: one all-to-all per single-mesh-axis move of the replayed
    to_pencil/from_pencil chain, each moving the whole local block —
    and zero all-gathers (the replicate+reslice fallback)."""
    from poissbox_tpu.ops import compact_dist
    from poissbox_tpu.utils.census import census, pencil_lapl_model

    n = 64
    gm = _grid(topo_devices, n=n, pgrid=(2, 2, 2))
    hlo = _compile_hlo(lambda f: compact_dist.lapl(f, gm), gm, n)
    got = census(hlo)
    want = pencil_lapl_model(gm, itemsize=4)
    a2a = got.get("all-to-all", {"count": 0, "bytes": 0})
    assert a2a["count"] == want["count"], (a2a, want)
    assert a2a["bytes"] == want["bytes"], (a2a, want)
    assert "all-gather" not in got, got


def test_mgcg_solve_census(topo_devices):
    """Whole-solve tripwires on the compiled MG-CG step: the Krylov loop
    body holds a bounded number of scalar all-reduces (CG's reduction
    groups), and the largest all-gather in the module is a replicated
    COARSE level, never a fine-level field."""
    from poissbox_tpu.config import SolverOptions
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.ksp import make_solver
    from poissbox_tpu.utils.census import census, max_gather_bytes, while_bodies

    n = 64
    gm = _grid(topo_devices, n=n)
    A = make_laplacian_operator(gm)
    opts = SolverOptions(ksp_type="cg", pc_type="mg", ksp_rtol=1e-6,
                         ksp_max_it=20)
    solve = make_solver(A, opts, grid=gm, dtype=jnp.float32)
    hlo = _compile_hlo(lambda b: solve(b).x, gm, n)

    bodies = while_bodies(hlo)
    assert bodies, "no while loop in the compiled CG solve"
    body_stats = {}
    for body in bodies:
        c = census(hlo, computation=body)
        if c:
            body_stats[body] = c
    assert body_stats, "no collectives found in any while body"
    for body, got in body_stats.items():
        ar = got.get("all-reduce", {"count": 0, "bytes": 0})
        # CG: <p,Ap> + the (rv, sv, sr) group (+ the coarse-transition
        # partial-sum reduce); payloads are scalars + one coarse level
        # (observed on v5e:2x4 (4,2,1): 4 all-reduces, 232 B total,
        # 250 permutes of 463 KB per iteration)
        assert ar["count"] <= 6, (body, got)
        assert ar["bytes"] <= 4096, (body, got)
        assert "all-to-all" not in got, (body, got)
        ag = got.get("all-gather", {"count": 0, "bytes": 0})
        assert ag["bytes"] <= 4096, (body, got)  # coarse levels only

    # distributed fine levels: 64^3 on (4,2,1) shards to (16,32,64) blocks;
    # levels stay distributed while local extents are even, so the largest
    # legitimate gather is the first replicated coarse level. Anything
    # fine-level sized (>= 1 MB) is an accidental replication.
    assert max_gather_bytes(hlo) <= 256 * 1024, max_gather_bytes(hlo)
