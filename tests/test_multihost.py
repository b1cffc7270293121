"""True multi-process (multi-host analogue) test: two OS processes, each with
2 virtual CPU devices, joined via ``jax.distributed`` into one 4-device data
mesh (parallel/mesh.py init_distributed semantics). Verifies the multi-host
promises end-to-end:

- ``InfiniteRandomSampler`` reads ``jax.process_index``/``process_count`` and
  yields DISJOINT per-process index shards of the same seeded permutation;
- each process feeds only its LOCAL shard of the global batch
  (``jax.make_array_from_process_local_data`` — the host-sharded pipeline);
- ONE train step over the global mesh runs, GSPMD inserting the cross-process
  grad psum + global BN reductions, and both processes end with identical
  replicated params (the reference's DDP analogue, amp/ddp.py).
"""
import json
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, sys.argv[3])

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from contrastyou_tpu.data.sampler import InfiniteRandomSampler
from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_train_step
from contrastyou_tpu.models import UNet
from contrastyou_tpu.parallel import is_master, make_mesh

out = {"pid": pid, "process_count": jax.process_count(),
       "global_devices": len(jax.devices()),
       "local_devices": jax.local_device_count(),
       "is_master": is_master()}

# --- sampler: process shard read from jax.distributed state ---
sampler = iter(InfiniteRandomSampler(16, seed=7))
out["indices"] = [int(next(sampler)) for _ in range(8)]  # one permutation

# --- one global-mesh train step from per-process local batch shards ---
H, B_GLOBAL = 32, 4
mesh = make_mesh()  # all 4 global devices

model = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.float32)
bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                max_epoch=1, steps_per_epoch=1)
state = init_train_state(bundle, [], optimizer, jax.random.PRNGKey(1))
step = build_train_step(bundle, optimizer, [], mode="ft")

rng = np.random.default_rng(100 + pid)  # DIFFERENT local data per process
local = {
    "labeled_image": rng.random((B_GLOBAL // 2, H, H, 1), np.float32),
    "labeled_target": rng.integers(0, 4, (B_GLOBAL // 2, H, H)).astype(np.int32),
}

def _global(name, arr):
    spec = P(*(["data"] + [None] * (arr.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), arr)

batch = {k: _global(k, v) for k, v in local.items()}

def _replicated(x):
    xnp = np.asarray(x)
    return jax.make_array_from_callback(
        xnp.shape, NamedSharding(mesh, P()), lambda idx: xnp[idx])

state = jax.tree.map(_replicated, state)
new_state, metrics = step(state, batch, jax.random.PRNGKey(5), jnp.int32(0))
out["sup_loss"] = float(metrics["sup_loss"]) if "sup_loss" in metrics else \
    float(next(iter(jax.tree.leaves(metrics))))
out["param_checksum"] = float(sum(
    float(jnp.sum(jnp.abs(leaf).astype(jnp.float64)))
    for leaf in jax.tree.leaves(new_state.params)))
print("WORKER_JSON " + json.dumps(out), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(i), str(REPO)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
        for i in range(2)]
    results = {}
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("WORKER_JSON ")]
        assert line, stdout
        rec = json.loads(line[-1][len("WORKER_JSON "):])
        results[rec["pid"]] = rec

    r0, r1 = results[0], results[1]
    # topology
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 4
    assert r0["local_devices"] == r1["local_devices"] == 2
    assert r0["is_master"] and not r1["is_master"]
    # disjoint sampler shards covering the whole permutation
    i0, i1 = set(r0["indices"]), set(r1["indices"])
    assert len(r0["indices"]) == 8 and len(r1["indices"]) == 8
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(16))
    # the global step saw both processes' (different) data, and params stayed
    # replicated: identical post-update checksums on both hosts
    assert r0["sup_loss"] == r1["sup_loss"]
    assert r0["param_checksum"] == r1["param_checksum"]
    assert r0["param_checksum"] > 0
