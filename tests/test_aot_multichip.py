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
