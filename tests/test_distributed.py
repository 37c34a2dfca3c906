"""Genuinely multi-process coverage for `parallel.distributed`: two CPU
processes join through `jax.distributed.initialize`, build a global mesh,
and run a psum'd sharded computation (the adaptation-reduction pattern)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from aux_ssm_tpu.parallel import distributed
info = distributed.initialize(coordinator_address=coord, num_processes=2,
                              process_id=proc_id)
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info
assert distributed.is_multihost()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from aux_ssm_tpu.parallel.mesh import make_mesh, CHAINS

mesh = make_mesh(axis_names=(CHAINS,))            # 4 global devices
sharding = NamedSharding(mesh, P(CHAINS))

# Each process contributes its local shard of a global (4,) array; the mean
# (the cross-chain acceptance reduction) must see all four values.
local = jnp.arange(2, dtype=jnp.float32) + 2.0 * proc_id
global_arr = jax.make_array_from_single_device_arrays(
    (4,), sharding,
    [jax.device_put(local[i:i+1], d) for i, d in enumerate(jax.local_devices())],
)
total = jax.jit(jnp.mean, out_shardings=NamedSharding(mesh, P()))(global_arr)
# Values 0,1,2,3 -> mean 1.5 on every process.
assert float(total) == 1.5, float(total)
print(f"proc {proc_id} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("{repo!r}", repr(repo)))

    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
