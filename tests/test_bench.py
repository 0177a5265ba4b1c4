"""Bench harness contract tests (no reference analog — driver contract).

The round-3 driver bench timed out (BENCH_r03.json rc=124) because the
retry ladder's worst case (~3h) exceeded the driver budget, and a latent
tuple-arity crash hid in the child-timeout arm. These tests pin the fix:
even when a child HANGS, bench.py prints its one JSON line and exits 0
inside the wall budget.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, 'bench.py')


def _run_bench(env_over, budget):
    env = dict(os.environ)
    env.update(env_over)
    env['MNT_BENCH_BUDGET'] = str(budget)
    t0 = time.time()
    out = subprocess.run([sys.executable, '-u', BENCH],
                         capture_output=True, text=True,
                         timeout=budget + 60, cwd=REPO, env=env)
    return out, time.time() - t0


def test_bench_survives_hung_child():
    """A child that hangs forever must not break the JSON contract."""
    budget = 45
    out, dt = _run_bench({'MNT_BENCH_FAKE_HANG': 'cbox_path'}, budget)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    rec = json.loads(lines[-1])
    assert rec['metric'] == 'cbox_path_throughput_measured'
    assert rec['value'] == 0.0
    assert rec['extra']['cbox_path_error'] in ('timeout', 'budget exhausted')
    # the hard budget holds with a small scheduling allowance
    assert dt < budget + 25, f'bench ran {dt:.0f}s on a {budget}s budget'


def test_bench_spawn_timeout_tuple():
    """_spawn must return a 3-tuple on every arm (r3 bug: timeout arm
    returned 2 values and crashed every caller)."""
    sys.path.insert(0, REPO)
    import importlib
    bench = importlib.import_module('bench')
    os.environ['MNT_BENCH_FAKE_HANG'] = 'cbox_path'
    try:
        res = bench._spawn('cbox_path', 3)
    finally:
        os.environ.pop('MNT_BENCH_FAKE_HANG', None)
    assert len(res) == 3 and res[0] is None and res[2] == 'timeout'
    # budget-exhausted guard: non-positive timeout never launches a child
    res = bench._spawn('cbox_path', 0)
    assert len(res) == 3 and res[2] == 'budget exhausted'
