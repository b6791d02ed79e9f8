"""Two REAL jax.distributed CPU processes exercising parallel/dist.py.

Reference `launch` forks N worker processes (train_net.py:399-412, d2
launch/comm); every prior test of dist.py ran at process_count=1 where the
collectives are identity shortcuts. Here two subprocesses initialize a real
coordinator and run all_gather_objects (pickle pad/trim over
process_allgather), resolve_eval_mesh (per-process local mesh from a global
one), and sharded_eval_loop (round-robin sharding + evaluator merge); the
merged result must equal the single-process evaluation of the same records.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "twoproc_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_allgather_mesh_and_eval_loop(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, str(i), str(outs[i])],
            cwd=str(Path(__file__).parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process workers timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    # round-robin over max_records=10 with record 7 mapper-skipped:
    # process 0 gets ids 0,2,4,6,8; process 1 gets 1,3,5,9 (7 skipped)
    assert results[0]["done"] == 5
    assert results[1]["done"] == 4
    # after the cross-process merge BOTH processes hold every evaluated id
    # exactly once — identical to a single-process run over the same cap
    expected = sorted(i for i in range(10) if i != 7)
    assert results[0]["seen"] == expected
    assert results[1]["seen"] == expected
