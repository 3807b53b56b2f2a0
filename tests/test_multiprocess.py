"""Multi-host code path, proven without hardware: 2 OS processes x 2
virtual CPU devices form the (hosts, chips) pod mesh; the batch is
sharded over all 4 devices via ``jax.distributed`` + Gloo collectives.

This is the executable evidence for the BASELINE north star's multi-host
requirement (SURVEY.md section 2.3: DCN-analog axis across processes);
the solve itself is collective-free, and the imitation gradient is the
one cross-process reduction.
"""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_mesh():
    worker = os.path.join(os.path.dirname(__file__), '_mp_worker.py')
    port = _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)   # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(worker)))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert 'WORKER_OK' in out, f'worker {i} incomplete:\n{out}'

    def field(out, name):
        for line in out.splitlines():
            if line.startswith(name + ' '):
                return line.split()[1]
        raise AssertionError(f'{name} not found in:\n{out}')

    # sharded solve matches the single-process reference on both workers
    # (f32; the cross-process psum reassociates the gradient reduction,
    # grads are O(100), so 1e-4 abs ~ 1e-6 rel)
    for out in outs:
        assert float(field(out, 'SOLVE_ERR')) <= 1e-5
        assert float(field(out, 'LOSS_ERR')) <= 1e-5
        assert float(field(out, 'GRAD_ERR')) <= 1e-4

    # both processes see the identical reduced loss and gradient
    assert field(outs[0], 'LOSS') == field(outs[1], 'LOSS')
    assert field(outs[0], 'GRAD_SUM') == field(outs[1], 'GRAD_SUM')

    # explicit shard_map train step (make_sharded_train_step): the
    # pmean crosses the process axis; both processes must apply the
    # identical update, matching the single-process reference step
    for out in outs:
        assert float(field(out, 'TRAIN_LOSS_ERR')) <= 1e-5
        assert float(field(out, 'TRAIN_THETA_ERR')) <= 1e-5
    assert field(outs[0], 'TRAIN_LOSS') == field(outs[1], 'TRAIN_LOSS')

    # weak-scaling efficiency proxy: fixed per-process load, 1-process
    # local-mesh baseline vs the 2-process pod run.  A structural bound
    # only (virtual CPU devices + Gloo, not ICI) - the floor is loose
    # to tolerate CI noise while still catching structural regressions
    # (e.g. an accidental all-gather of the batch).
    for i, out in enumerate(outs):
        eff = float(field(out, 'WEAK_EFF'))
        print(f'worker {i}: weak-scaling efficiency {eff:.3f} '
              f'(local {field(out, "T_LOCAL_US")}us vs '
              f'global {field(out, "T_GLOBAL_US")}us)')
        assert eff > 0.2, f'worker {i} weak-scaling efficiency {eff}'
