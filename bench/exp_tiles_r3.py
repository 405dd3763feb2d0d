"""Round-3 tile sweep for the plain stencil kernel at 256^3 (chasing the
warm 88.8 -> 84-86 GDoF/s drift, VERDICT r2 weak #2). Times _apply with
explicit tiles; one JSON line per config."""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from poissbox_tpu.ops.stencil_pallas import _apply  # noqa: E402
from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    configs = [(8, n), (4, n), (2, n), (16, n), (8, n // 2), (8, n // 4),
               (16, n // 2), (32, n // 4)]
    if len(sys.argv) > 2:
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in sys.argv[2].split(",")]
    dtype = jnp.float32
    deltas = (1.0 / n,) * 3
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), dtype)
    for tiles in configs:
        try:
            t = kernel_time(lambda v: _apply(v, deltas, tiles), u,
                            lo=25, hi=100)
            print(json.dumps({"tiles": tiles, "ms": t * 1e3,
                              "gdofs": n**3 / t / 1e9}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tiles": tiles,
                              "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
