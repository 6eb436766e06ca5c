"""Multi-host (DCN) initialization test: two real OS processes form a
jax.distributed cluster over a local coordinator, shard one global batch
by host with local_shard_info, and must agree with the single-process
result (VERDICT r1 item 5 — the r1 ordering bug made initialize a no-op).

CPU cross-process collectives ride jaxlib's gloo backend; each child
gets 2 virtual devices -> a 4-device global 'data' mesh.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

CHILD = r"""
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize workaround

# the function under test: must run BEFORE any backend query
from histogan_tpu.parallel import (
    local_shard_info, make_mesh, maybe_initialize_distributed,
)

maybe_initialize_distributed()
assert jax.process_count() == 2, f"process_count={jax.process_count()}"
assert jax.device_count() == 4, f"device_count={jax.device_count()}"

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()
local_b, idx, n = local_shard_info(8)
assert (local_b, n) == (4, 2), (local_b, n)

data = (np.arange(8, dtype=np.float32) + 1.0) ** 2
local = data[idx * local_b:(idx + 1) * local_b]
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8,))
mean = jax.jit(jnp.mean, out_shardings=NamedSharding(mesh, P()))(garr)
print("MEAN", float(mean), flush=True)

# device-resident dataset over the multi-host mesh: both processes hold
# the same data and (fixed-seed) draw the same indices; the jitted
# gather spans the global mesh and must reproduce the numpy oracle
from histogan_tpu.data.device_source import DeviceDataSource

rng0 = np.random.default_rng(0)
images = rng0.integers(0, 256, size=(6, 8, 8, 3), dtype=np.uint8)
pool = rng0.random((6, 3, 4, 4)).astype(np.float32)
src = DeviceDataSource(images, pool, mesh, batch_size=4, accum=1, seed=5)
b = next(src)
tot = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)),
              out_shardings=NamedSharding(mesh, P()))(b["d_images"])
r = np.random.default_rng(5)
idx = r.integers(0, 6, size=4)
want = float(images[idx].astype(np.float32).sum())
print("DSUM", float(tot), want, flush=True)

# FSDP layout on the multi-host mesh (parallel/fsdp.py): placing a host
# tree sharded across BOTH processes' devices, and unshard's jitted
# all-gather back to replicated — the path Trainer save/load uses,
# where a plain device_get of the sharded tree would touch
# non-addressable shards
from histogan_tpu.parallel import shard_state, unshard
from histogan_tpu.parallel.fsdp import sharded_bytes_per_device

tree = {"w": np.arange(16, dtype=np.float32).reshape(4, 4),
        "b": np.ones(3, np.float32)}
sh = shard_state(tree, mesh)
per_dev = sharded_bytes_per_device(sh)   # w: 4x1 shard (16 B) + b repl (12 B)
full = jax.device_get(unshard(sh, mesh))
ok = int(np.array_equal(full["w"], tree["w"])
         and np.array_equal(full["b"], tree["b"]))
print("FSDP", per_dev, ok, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        repo_root = str(Path(__file__).resolve().parents[1])
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            # the child script lives in tmp_path; python puts the script's
            # dir (not cwd) on sys.path, so the package must be injected
            "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=str(Path.cwd()),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    outs = [p.communicate(timeout=300)[0] for p in procs]
    want = float(np.mean((np.arange(8, dtype=np.float32) + 1.0) ** 2))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        mean_lines = [l for l in out.splitlines() if l.startswith("MEAN ")]
        assert mean_lines, f"proc {pid} printed no MEAN:\n{out}"
        got = float(mean_lines[-1].split()[1])
        # single-process oracle: exact in fp32 (psum of identical shards)
        assert got == want, f"proc {pid}: {got} != {want}"
        dsum_lines = [l for l in out.splitlines() if l.startswith("DSUM ")]
        assert dsum_lines, f"proc {pid} printed no DSUM:\n{out}"
        got_d, want_d = map(float, dsum_lines[-1].split()[1:3])
        assert got_d == want_d, (
            f"proc {pid}: device-dataset gather {got_d} != oracle {want_d}")
        fsdp_lines = [l for l in out.splitlines() if l.startswith("FSDP ")]
        assert fsdp_lines, f"proc {pid} printed no FSDP:\n{out}"
        per_dev, ok = map(int, fsdp_lines[-1].split()[1:3])
        # w (64 B) sharded 4-way -> 16 B + replicated b (12 B)
        assert per_dev == 28, f"proc {pid}: FSDP per-device bytes {per_dev}"
        assert ok == 1, f"proc {pid}: FSDP unshard round-trip mismatch"


CKPT_CHILD = r"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize workaround

from histogan_tpu.parallel import (
    make_mesh, maybe_initialize_distributed, shard_state, unshard,
)
from histogan_tpu.parallel.fsdp import state_shardings

maybe_initialize_distributed()
assert jax.process_count() == 2

import numpy as np
from jax.experimental import multihost_utils

from histogan_tpu.train.checkpoint import CheckpointStore

mesh = make_mesh()

# a Trainer-shaped nested state: mixed shapes so some leaves shard on
# the mesh axis and small ones stay replicated (parallel/fsdp.py rules)
rng = np.random.default_rng(3)
state = {
    "params_g": {"S": {"kernel": rng.standard_normal((8, 8)).astype(np.float32),
                       "bias": rng.standard_normal(8).astype(np.float32)}},
    "opt_g": {"exp_avg": rng.standard_normal((8, 8)).astype(np.float32)},
    "pl_mean": np.float32(0.25),
}
shardings = state_shardings(state, mesh)
sharded = shard_state(state, mesh, shardings)

# Trainer.save path: all-gather (multi-host-safe), then store.save on
# EVERY process — orbax syncs internally and gates file writes to
# host 0 (a host-0-only call deadlocks; checkpoint.py save note)
store = CheckpointStore(os.environ["CKPT_DIR"], "mh_fsdp")
host_state = jax.device_get(unshard(sharded, mesh))
store.save(host_state, 1)
multihost_utils.sync_global_devices("ckpt_saved")  # all files visible

# Trainer.load path: restore on EVERY process against a host template,
# then re-place onto the FSDP mesh
restored = store.restore(1, host_state)
replaced = shard_state(restored, mesh, shardings)

# round-trip equality: all-gather the re-placed tree and compare to the
# original host values, on both processes
full = jax.device_get(unshard(replaced, mesh))
flat0 = jax.tree_util.tree_leaves(state)
flat1 = jax.tree_util.tree_leaves(full)
ok = int(len(flat0) == len(flat1) and all(
    np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(flat0, flat1)))
print("ROUNDTRIP", ok, flush=True)
"""


def test_two_process_fsdp_checkpoint_roundtrip(tmp_path):
    """VERDICT r3 next #7: save under FSDP on the 2-process cluster,
    restore, assert tree equality — the reference's resume contract
    (histoGAN/histoGAN.py:1124-1139) exercised on the exact
    Trainer._host_state -> CheckpointStore -> _place path."""
    script = tmp_path / "ckpt_child.py"
    script.write_text(CKPT_CHILD)
    port = _free_port()
    ckpt_dir = tmp_path / "models"

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        repo_root = str(Path(__file__).resolve().parents[1])
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "CKPT_DIR": str(ckpt_dir),
            "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=str(Path.cwd()),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        lines = [l for l in out.splitlines() if l.startswith("ROUNDTRIP ")]
        assert lines, f"proc {pid} printed no ROUNDTRIP:\n{out}"
        assert lines[-1].split()[1] == "1", (
            f"proc {pid}: FSDP checkpoint round-trip mismatch:\n{out}")


def test_maybe_initialize_is_noop_without_coordinator(monkeypatch):
    from histogan_tpu.parallel import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    maybe_initialize_distributed()  # must not raise or touch the backend
