"""Worker script for the multi-host simulation test (run via subprocess).

Each process owns 4 virtual CPU devices; together the 2 processes form an
8-device mesh, mirroring a 2-host TPU pod slice. Exercises
``initialize_distributed`` (the reference's accelerate/SLURM multi-node
analog), per-host batch slicing, and a cross-process XLA all-reduce.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unified_video_action_tpu.utils.cpu_platform import force_cpu

force_cpu(4)


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])

    import jax

    from unified_video_action_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    global_batch = 16
    sl = mesh_lib.local_batch_slice(global_batch)
    assert sl == slice(pid * 8, pid * 8 + 8), sl

    # global data-parallel array assembled from per-host shards
    full = np.arange(global_batch, dtype=np.float32) * 10.0
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(sharding, full[sl])
    assert garr.shape == (global_batch,)

    @jax.jit
    def global_sum(x):
        return x.sum()

    out = global_sum(garr)
    expected = float(full.sum())
    got = float(jax.device_get(out))
    assert got == expected, (got, expected)
    print(f"proc {pid}: OK global_sum={got}", flush=True)


if __name__ == "__main__":
    main()
