"""Worker for tests/test_multihost.py: one of two cooperating processes.

Each process owns 2 virtual CPU devices; together they form a 4-device
2-process distributed runtime — the smallest topology that executes the
DCN branch of ``make_hybrid_mesh`` (bootstrap.py:100-111) and cross-process
collectives for real.
"""

import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from agplace_tpu.parallel.bootstrap import (  # noqa: E402
    initialize_distributed,
    make_hybrid_mesh,
)

ok = initialize_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                            num_processes=2, process_id=PID)
assert ok, "initialize_distributed returned False under a coordinator"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

# DCN branch of make_hybrid_mesh: data axis spans both processes
mesh = make_hybrid_mesh(gallery_parallel=2)
assert dict(mesh.shape) == {"data": 2, "gallery": 2}, dict(mesh.shape)
mesh_flat = make_hybrid_mesh(gallery_parallel=1)
assert dict(mesh_flat.shape) == {"data": 4, "gallery": 1}

# ---- cross-process psum: a global array sharded over the data axis -------
sharding = NamedSharding(mesh_flat, P("data"))
local = np.arange(4.0, dtype=np.float32)[2 * PID: 2 * PID + 2]
garr = jax.make_array_from_process_local_data(sharding, local, (4,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh_flat, P()))(garr)
assert float(total) == 6.0, float(total)  # 0+1+2+3 across BOTH processes

# ---- one sharded train step across processes -----------------------------
# tiny linear regression: batch rows sharded over the global data axis, the
# gradient all-reduce crosses the process boundary (GSPMD inserts the DCN
# collective); both processes must end with identical updated params.
rng = np.random.default_rng(0)  # same seed -> identical init on both hosts
w0 = rng.standard_normal((8, 4)).astype(np.float32)
x_all = rng.standard_normal((16, 8)).astype(np.float32)
y_all = rng.standard_normal((16, 4)).astype(np.float32)

repl = NamedSharding(mesh_flat, P())
batch_sh = NamedSharding(mesh_flat, P("data"))
w = jax.make_array_from_process_local_data(repl, w0, w0.shape)
x = jax.make_array_from_process_local_data(
    batch_sh, x_all[8 * PID: 8 * PID + 8], x_all.shape)
y = jax.make_array_from_process_local_data(
    batch_sh, y_all[8 * PID: 8 * PID + 8], y_all.shape)


@jax.jit
def step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)

    g = jax.grad(loss)(w)
    return w - 0.1 * g, loss(w)


w1, l0 = step(w, x, y)
w1_host = np.asarray(jax.device_get(w1))

# oracle: single-process gradient of mean((xw-y)^2) over the FULL batch
w1_ref = w0 - 0.1 * (x_all.T @ (2.0 * (x_all @ w0 - y_all)) / (16 * 4))
np.testing.assert_allclose(w1_host, w1_ref, rtol=1e-5, atol=1e-6)

print(f"worker {PID} OK", flush=True)
