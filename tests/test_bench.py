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


def test_bench_happy_path_captures_all_three_configs():
    """Schedule contract (r4 verdict #1): with fast children, the final
    JSON must contain ALL THREE anchor throughputs — rounds 3 and 4 both
    shipped driver artifacts whose volumetric keys read 'budget
    exhausted' because the cbox child (carrying the proxy sweeps) ran
    first and ate the budget. Volumetrics now run first and the proxies
    are a separate best-effort child."""
    budget = 60
    out, dt = _run_bench({'MNT_BENCH_FAKE': 'fast'}, budget)
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    extra = rec['extra']
    for key in ('hetvol_volpath_mrays', 'cbox_nlvrl_mrays',
                'cbox_path_mrays'):
        assert key in extra, (key, extra)
        assert extra[key] > 0
    assert rec['value'] == extra['cbox_path_mrays']
    # proxies ran too (leftover budget) and carry the end-to-end
    # sharded-path timing key
    assert 'render_dist_fold' in extra, extra
    assert dt < 30, f'fake-fast bench took {dt:.0f}s'


def test_bench_volumetrics_run_before_headline():
    """The stage order itself (volumetrics first) — pinned so a refactor
    cannot quietly restore the r3/r4 failure mode."""
    sys.path.insert(0, REPO)
    import importlib
    bench = importlib.import_module('bench')
    keys = [k for k, _, _ in bench.STAGES]
    assert keys.index('hetvol_volpath') < keys.index('cbox_path')
    assert keys.index('cbox_nlvrl') < keys.index('cbox_path')
    # caps sized to the measured r4 walls (hetvol 448s, nlvrl 534s)
    caps = {k: c for k, c, _ in bench.STAGES}
    assert caps['hetvol_volpath'] >= 600
    assert caps['cbox_nlvrl'] >= 600


def test_spawn_salvages_partial_output_on_timeout():
    """A child that prints a partial JSON line and THEN hangs (the real
    r3/r4 failure mode: proxies finish weak_scaling, measure_fold hangs
    on a dead worker) must not lose the completed measurements: _spawn
    parses TimeoutExpired's captured stdout."""
    sys.path.insert(0, REPO)
    import importlib
    bench = importlib.import_module('bench')
    os.environ['MNT_BENCH_FAKE'] = 'partial_hang'
    try:
        mrays, rec, err = bench._spawn('proxies', 6)
    finally:
        os.environ.pop('MNT_BENCH_FAKE', None)
    assert err is None and rec is not None, (mrays, rec, err)
    assert rec['weak_scaling'] == {'fake': True}
