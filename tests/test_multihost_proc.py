"""REAL multi-process multihost validation (2 JAX processes over Gloo).

The virtual 8-device mesh in conftest.py fakes multiple chips in ONE
process; everything `jax.process_count()`-gated (shard_batch's
make_array_from_process_local_data path, ragged gather_array,
gather_list, BatchLoader padded_tail alignment) is dead code there. This
test launches two actual `jax.distributed` CPU processes (4 virtual
devices each) and proves the pod input/eval protocol end to end:

  * shard_batch assembles a global batch from per-host shards — the
    jitted global sum agrees across hosts;
  * gather_array handles RAGGED per-host row counts (the reference's
    ddp_allgather semantics, utils/distributed.py:133-151);
  * gather_list round-trips Python objects;
  * two BatchLoaders (one per host) + padded_tail trimming cover an
    uneven dataset exactly once with equal batch counts/shapes.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r'''
import sys
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
sys.path.insert(0, sys.argv[3])
from vast_tpu.data.loader import BatchLoader
from vast_tpu.parallel.collectives import gather_array, gather_list, host_rows
from vast_tpu.parallel.mesh import create_mesh, shard_batch

assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = create_mesh(dp=8)

# --- shard_batch: per-host shards -> one global batch ---------------
local = np.arange(4 * 2, dtype=np.float32).reshape(4, 2) + 100 * pid
out = shard_batch(mesh, {"x": local})
assert out["x"].shape == (8, 2)  # global shape, assembled in place
total = float(jax.jit(lambda x: x.sum())(out["x"]))
assert total == 28.0 + 800.0 + 28.0, total  # both hosts' rows counted

# --- ragged cross-host gathers ---------------------------------------
g = gather_array(np.full((pid + 1, 2), float(pid), np.float32))
assert g.shape == (3, 2) and float(g.sum()) == 4.0, (g.shape, g.sum())
li = gather_list([f"h{pid}_{i}" for i in range(pid + 2)])
assert li == ["h0_0", "h0_1", "h1_0", "h1_1", "h1_2"], li

# --- eval-shard alignment + exactly-once coverage --------------------
class DS:
    def __len__(self):
        return 11  # 11 % 2 hosts != 0 -> padded_tail on host 1

    def __getitem__(self, i):
        return i

    def collate(self, s):
        return {"x": np.asarray(s)}

ld = BatchLoader(DS(), 4, shuffle=False, drop_last=False, num_workers=1,
                 host_id=pid, num_hosts=2)
rows = np.concatenate([b["x"] for b in ld])
rows = rows[: len(rows) - ld.padded_tail]
all_rows = gather_array(rows.astype(np.int32))
assert sorted(all_rows.tolist()) == list(range(11)), all_rows

# --- the full eval-driver protocol through a jitted SPMD program ------
# _full_batches pad -> shard_batch global assembly -> jit -> host_rows
# (global outputs span processes; np.asarray would raise) -> trim
# pad rows + padded_tail -> ragged gather: exactly-once, in id order
from vast_tpu.evaluation.evaluation_mm import _device_batch, _full_batches

class DS2(DS):
    def __getitem__(self, i):
        return float(i)

    def collate(self, s):
        return {"x": np.asarray(s, np.float32)}

ld2 = BatchLoader(DS2(), 4, shuffle=False, drop_last=False, num_workers=1,
                  host_id=pid, num_hosts=2)
f = jax.jit(lambda x: x * 2.0)
feats = []
for batch, nv, _nvt in _full_batches(ld2):
    db = _device_batch(batch, mesh)
    assert db["x"].shape[0] == 8  # global batch assembled across hosts
    feats.append(host_rows(f(db["x"]))[:nv])
local = np.concatenate(feats)
local = local[: len(local) - ld2.padded_tail]
full = gather_array(local)
expect = [2.0 * i for i in list(range(0, 11, 2)) + list(range(1, 11, 2))]
assert full.tolist() == expect, (full.tolist(), expect)

# --- strided multi-host rerank: hosts score disjoint segment strides,
# sum_across_hosts merges them back to the FULL matrix ----------------
from vast_tpu.evaluation.evaluation_mm import rerank_scores

class FakeModel:
    def apply(self, variables, cond, ids, mask, method=None):
        import jax.numpy as jnp
        t = ids.shape[0] // cond.shape[0]
        return jnp.repeat(cond[:, 0, 0], t) + ids[:, 0]

rs = np.random.RandomState(0)
itc = rs.randn(6, 4)          # identical on both hosts (replicated inputs)
cseq = rs.randn(4, 3, 2).astype(np.float32)
tids = rs.randint(0, 50, (6, 5)).astype(np.int32)
tmask = np.ones((6, 5), np.int32)
out2 = rerank_scores(FakeModel(), {}, cseq, tids, tmask, itc, top_k=2,
                     direction="forward", texts_per_seg=2, conds_per_call=2)
for t in range(6):
    for c in np.argsort(-itc[t])[:2]:
        assert abs(out2[t, c] - (cseq[c, 0, 0] + tids[t, 0])) < 1e-4
assert (out2 != 0).sum() == 12, (out2 != 0).sum()
print("CHILD OK", pid, flush=True)
'''


_SAVE_CHILD = r'''
import sys
pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, sys.argv[4])
from jax.sharding import NamedSharding, PartitionSpec as P
from vast_tpu.parallel.mesh import create_mesh, replicated
from vast_tpu.training.saver import ModelSaver

mesh = create_mesh(dp=2, fsdp=4)
sh = NamedSharding(mesh, P("fsdp"))
# an fsdp-sharded param: each process owns DIFFERENT shards, so the
# orbax save/restore is genuinely collective
w = jax.jit(lambda: jnp.arange(16.0).reshape(8, 2), out_shardings=sh)()
step = jax.jit(lambda: jnp.ones((), jnp.int32), out_shardings=replicated(mesh))()

class State:
    params = {"w": w}
    opt_state = {"mu": {"w": w}}
State.step = step

sv = ModelSaver(out)
sv.save(State(), 3)  # every host calls save; host 0 does the fs surgery
like = {"w": jax.jit(lambda: jnp.zeros((8, 2)), out_shardings=sh)()}
back = sv.restore_params(3, like)
got = np.asarray(jax.device_get(back["w"]))
assert np.array_equal(got, np.arange(16.0).reshape(8, 2)), got
print("SAVE OK", pid, flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_protocol(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = os.environ.copy()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = str(_free_port())
    procs = [
        subprocess.Popen([sys.executable, str(child), str(i), port, repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"CHILD OK {i}" in o, f"host {i}:\n{o}"


@pytest.mark.slow
def test_two_process_collective_save_restore(tmp_path):
    """ModelSaver.save is collective on pods: every host writes its own
    shards of an fsdp-sharded param and the round trip reassembles the
    full value. Restoring into host-local arrays is what orbax rejects —
    hence pipeline.train restores AFTER shard_state."""
    child = tmp_path / "save_child.py"
    child.write_text(_SAVE_CHILD)
    out_dir = tmp_path / "ckpt_out"
    out_dir.mkdir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = os.environ.copy()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = str(_free_port())
    procs = [
        subprocess.Popen([sys.executable, str(child), str(i), port,
                          str(out_dir), repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"SAVE OK {i}" in o, f"host {i}:\n{o}"


def test_assemble_addressable_rows_non_batch_split():
    """host_rows must reassemble shards that also split a NON-batch dim
    (a tp split propagated into an unpinned output) instead of keeping
    one fragment per row offset — that would silently truncate features
    and corrupt retrieval scores."""
    import numpy as np

    from vast_tpu.parallel.collectives import assemble_addressable_rows

    full = np.arange(4 * 6, dtype=np.float32).reshape(4, 6)
    shards = []
    for r0, r1 in ((0, 2), (2, 4)):
        for c0, c1 in ((0, 3), (3, 6)):
            idx = (slice(r0, r1), slice(c0, c1))
            shards.append((idx, full[r0:r1, c0:c1]))
    # replicated duplicates (an fsdp axis) must dedup, not double-count
    shards += shards[:2]
    out = assemble_addressable_rows(shards, full.shape, full.dtype)
    np.testing.assert_array_equal(out, full)

    # batch-only sharding (the common case) passes through per row group
    shards = [((slice(0, 2), slice(0, 6)), full[0:2]),
              ((slice(2, 4), slice(0, 6)), full[2:4])]
    out = assemble_addressable_rows(shards, full.shape, full.dtype)
    np.testing.assert_array_equal(out, full)

    # shards that do NOT tile the feature dim raise instead of guessing
    import pytest as _pytest
    bad = [((slice(0, 4), slice(0, 3)), full[:, 0:3])]
    with _pytest.raises(ValueError, match="do not tile"):
        assemble_addressable_rows(bad, full.shape, full.dtype)
