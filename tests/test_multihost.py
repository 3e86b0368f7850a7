"""Multi-host DCN execution, exercised for real on localhost.

SURVEY.md §2.6/§5 name ``jax.distributed.initialize`` over DCN as a
first-class build item. This test launches TWO OS processes, each owning 2
virtual CPU devices, brings them up through
``parallel.mesh.initialize_distributed`` against a localhost coordinator,
feeds each process its ``process_shard`` slice of the same global batch
(``train.loop.batch_iter(across_processes=True)``), and runs one real
data-parallel training step (CNN-BiLSTM + pmean grads + sync-BN) over the
4-device global mesh. Both processes must agree with each other AND with a
single-process 4-device run of the identical step — cross-process
collectives must not change the math.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
port, pid, n_proc, outpath = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={4 // n_proc}"
)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["AAD_REPO"])
from audioanalysisdetector_tpu.parallel.mesh import initialize_distributed, process_shard

if n_proc > 1:
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
from audioanalysisdetector_tpu.train import (
    TrainState, get_loss, make_optimizer, make_train_step,
)
from audioanalysisdetector_tpu.train.loop import batch_iter

devices = jax.devices()
assert len(devices) == 4, devices
mesh = Mesh(np.asarray(devices), ("data",))

B, F, T = 8, 19, 63
rng = np.random.default_rng(0)
X = rng.standard_normal((B, F, T)).astype(np.float32)
Y = rng.integers(0, 2, B).astype(np.int32)

model = CNNBiLSTMHybrid(logits=True, bn_axis_name="data")
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F, T)), train=False)
state = TrainState.create(
    apply_fn=model.apply, params=variables["params"],
    tx=make_optimizer("Adam", 1e-3), batch_stats=variables["batch_stats"],
)
inner = make_train_step(
    get_loss("BCELoss"), axis_name="data", has_batch_stats=True, binary_head=True
)
step = jax.jit(
    shard_map(inner, mesh=mesh, in_specs=(P(), P("data"), P("data"), P()),
              out_specs=(P(), P()), check_vma=False)
)

# the multi-host data path: same global permutation everywhere, local slice here
[(xb, yb, true)] = list(
    batch_iter(X, Y, B, shuffle=True, seed=1, across_processes=n_proc > 1)
)
if n_proc > 1:
    sh = NamedSharding(mesh, P("data"))
    xb = jax.make_array_from_process_local_data(sh, np.ascontiguousarray(xb), (B, F, T))
    yb = jax.make_array_from_process_local_data(sh, np.ascontiguousarray(yb), (B,))

new_state, metrics = step(state, xb, yb, jax.random.PRNGKey(1))
leaf = np.asarray(
    jax.tree_util.tree_leaves(new_state.params)[0].addressable_data(0)
)
json.dump(
    {
        "process": pid,
        "loss": float(np.asarray(metrics["loss"].addressable_data(0))),
        "acc": float(np.asarray(metrics["accuracy"].addressable_data(0))),
        "leaf_sum": float(leaf.sum()),
        "leaf_head": leaf.ravel()[:8].tolist(),
        "step": int(np.asarray(new_state.step.addressable_data(0))),
    },
    open(outpath, "w"),
)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, n_proc: int, port: int) -> list[dict]:
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["AAD_REPO"] = REPO
    procs, outs = [], []
    for pid in range(n_proc):
        out = str(tmp_path / f"out{n_proc}_{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(port), str(pid), str(n_proc), out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        results.append(json.load(open(out)))
    return results


@pytest.mark.slow
def test_two_process_dcn_step_matches_single_process(tmp_path):
    two = _run_workers(tmp_path, n_proc=2, port=_free_port())
    [one] = _run_workers(tmp_path, n_proc=1, port=_free_port())

    # both processes observe the identical replicated result
    assert two[0]["step"] == two[1]["step"] == 1
    assert two[0]["loss"] == pytest.approx(two[1]["loss"], abs=1e-6)
    np.testing.assert_allclose(two[0]["leaf_head"], two[1]["leaf_head"], atol=1e-6)

    # and the cross-process collectives don't change the math vs single-process
    assert two[0]["loss"] == pytest.approx(one["loss"], abs=1e-5)
    assert two[0]["acc"] == pytest.approx(one["acc"], abs=1e-6)
    assert two[0]["leaf_sum"] == pytest.approx(one["leaf_sum"], rel=1e-5)
    np.testing.assert_allclose(two[0]["leaf_head"], one["leaf_head"], atol=1e-5)
