"""Worker for test_parallel.py::test_two_process_distributed_cpu.

Launched twice (process_id 0 and 1) by the test. Exercises the REAL
multi-host path (parallel/mesh.py): `maybe_initialize_distributed` picking
up the coordinator from env vars, a global 2-process x 2-device CPU mesh,
and `from_process_local`'s multi-process branch
(`make_array_from_process_local_data`), then runs one collective over Gloo
to prove the assembled global array computes correctly.

Usage: python tests/_dist_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_few_shot_learning_tpu.utils.xla_flags import merge_xla_flags  # noqa: E402

# fresh spawned process: own the full flag set (2 local virtual devices)
os.environ["XLA_FLAGS"] = merge_xla_flags("", device_count=2)
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audio_few_shot_learning_tpu.parallel.mesh import (  # noqa: E402
    from_process_local,
    make_mesh,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed() is True
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

mesh = make_mesh()
assert mesh.size == 4

# Each process contributes its local half (2 episodes) of the global batch
# of 4; values encode the producing process so placement is checkable.
local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100.0 * pid
batch = {"x": local}
g = from_process_local(batch, mesh)["x"]
assert g.shape == (4, 3), g.shape

# One real collective over the assembled array: the global sum must see both
# processes' contributions (process 0: sum(0..5)=15, process 1: 15+600).
total = float(jax.jit(jnp.sum)(g))
np.testing.assert_allclose(total, 15.0 + (15.0 + 600.0))

# Local shards hold the local data verbatim.
for shard in g.addressable_shards:
    row = shard.index[0].start
    np.testing.assert_array_equal(np.asarray(shard.data), local[row - 2 * pid : row - 2 * pid + 1])

print(f"DIST_WORKER_OK {pid}", flush=True)
