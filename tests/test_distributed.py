"""
Multi-host (DCN) path: a REAL 2-process CPU run through
``maybe_initialize_distributed`` (VERDICT r2 item 7) — coordinator
bring-up, a cross-process reduction, the disjoint inference split, and
the identical-global-batch training contract.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json
import os
import sys

# env must be set by the parent BEFORE this interpreter imports jax
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.environ["ADELL_REPO"])
from adell_mri_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    shard_pids_for_host,
)

is_multi = maybe_initialize_distributed()
assert is_multi, "expected a 2-process run"
assert jax.process_count() == 2

from jax.experimental import multihost_utils

# cross-process reduction: sum of (process_index + 1) over 2 processes = 3
v = jnp.asarray([float(jax.process_index() + 1)])
total = float(multihost_utils.process_allgather(v).sum())
assert total == 3.0, total

# inference split is disjoint and covers all pids across hosts
pids = ["a", "b", "c", "d", "e"]
mine = shard_pids_for_host(pids)
all_pids = multihost_utils.process_allgather(
    jnp.asarray([pids.index(p) for p in mine] + [-1] * (len(pids) - len(mine)))
)
seen = sorted(int(i) for i in np.asarray(all_pids).ravel() if i >= 0)
assert seen == list(range(len(pids))), seen

# identical-global-batch contract: deterministic loaders produce the SAME
# batch stream on every host given the same seed
from adell_mri_tpu.data.loader import DataLoader
from adell_mri_tpu.data.samplers import RandomSampler


class _DS:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {"image": rng.normal(size=(4, 4)).astype(np.float32)}


loader = DataLoader(
    _DS(), sampler=RandomSampler(8, seed=7), batch_size=4, prefetch=1
)
first = next(iter(loader))["image"]
digest = float(np.sum(first * np.arange(first.size).reshape(first.shape)))
digests = multihost_utils.process_allgather(jnp.asarray([digest]))
assert np.allclose(np.asarray(digests), digest), digests

print(json.dumps({"process": jax.process_index(), "ok": True}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            ADELL_DISTRIBUTED="1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            ADELL_REPO=os.path.dirname(os.path.dirname(__file__)),
        )
        # a fresh interpreter must not inherit the parent's XLA_FLAGS
        # virtual-device count (1 local device per process is the point)
        env.pop("XLA_FLAGS", None)
        # the axon sitecustomize (PYTHONPATH) registers a PJRT plugin at
        # interpreter startup, initializing jax BEFORE the worker calls
        # jax.distributed.initialize and silently degrading it to a
        # single-process no-op — strip it from the workers
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["PYTHONPATH"] = env["ADELL_REPO"]
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["process"] for o in outs} == {0, 1}
    assert all(o["ok"] for o in outs)
