"""The bench record contract (VERDICT r4 #1).

The driver captures only a ~2000-character tail of bench.py stdout and
parses the LAST line. Rounds 3 and 4 both lost the headline number to this
pipeline (rc=124 kill; then a 4.6 KB record whose leading fields fell off
the tail). These tests pin the fix at the function level: the final line
must stay under 1.5 KB under worst-case scenario payloads, must parse from
a simulated 2000-char tail, and must carry the headline, sanity, floors and
north-star fields.
"""

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'bench.py')


@pytest.fixture(scope='module')
def bench():
    spec = importlib.util.spec_from_file_location('bench', _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _r4_results():
    """Round-4-shaped results dict: realistic keys and magnitudes."""
    return {
        'gauss': dict(fits_per_sec=8423.11, compile_first_run_s=101.3,
                      median_t=0.4462, n_toys=4096, host_fits_per_sec=12.55,
                      vs_baseline=671.13,
                      sanity=dict(median_t=0.4462,
                                  expected_chi2_1_median=0.4549,
                                  band=[0.35, 0.6], ok=True),
                      scenario_elapsed_s=160.0),
        'roofline': dict(chip='tpu-v5e', kernels=[
            {'kernel': 'binned_vgh(B=50,...)' + 'x' * 120,
             'gflops_achieved': 3000.0, 'frac_of_binding_roof': 0.359}
            for _ in range(6)]),
        'unbinned': dict(fits_per_sec=2479.34, vs_baseline=41.1),
        'xenon': dict(fits_per_sec=484.23, vs_baseline=2790.6),
        'unbinned_xenon': dict(fits_per_sec=150.6, vs_baseline=190.0),
        'bb': dict(fits_per_sec=388.95, vs_baseline=2275.0),
        'bblite': dict(fits_per_sec=433.82, vs_baseline=4178.7),
        'band': dict(limits_per_sec=34.24, median_ul=0.0808,
                     host_median_ul=0.0505, vs_baseline=340.7),
        'interval': dict(ul=0.04908, seconds_warm=0.512, host_ul=0.05424,
                         vs_baseline=17.1),
        'mcmc': dict(walker_steps_per_sec=725136.7, n_walkers=2048,
                     vs_baseline=122.9),
    }


def test_compact_line_survives_driver_tail(bench):
    full, line = bench.make_records(_r4_results(), done=True,
                                    elapsed_s=968.3)
    assert len(line) < 1500
    # The driver keeps the last 2000 chars of stdout; the full record is
    # printed right before the compact line, so the tail starts mid-full
    tail = (json.dumps(full) + '\n' + line)[-2000:]
    rec = json.loads(tail.splitlines()[-1])
    assert rec['value'] == pytest.approx(8423.11)
    assert rec['unit'] == 'fits/s/chip'
    assert rec['vs_baseline'] == pytest.approx(671.13)
    assert rec['sanity_ok'] is True
    assert rec['complete'] is True
    assert rec['floors_failed'] == []
    assert rec['scenarios']['xenon'] == pytest.approx(484.2)


def test_north_star_on_scoreboard(bench):
    _, line = bench.make_records(_r4_results(), done=True, elapsed_s=1.0)
    ns = json.loads(line)['north_star']
    assert ns['met'] is True
    assert ns['gauss_10k_s_1chip'] == pytest.approx(1e4 / 8423.11, abs=0.06)
    assert ns['xenon_10k_s_1chip'] == pytest.approx(1e4 / 484.23, abs=0.06)
    # The single-chip flagship time must beat the v5e-8 minute outright
    assert ns['gauss_10k_s_1chip'] < 60.0


def test_floor_regression_is_flagged(bench):
    results = _r4_results()
    results['unbinned']['fits_per_sec'] = 1500.0   # below the 2000 floor
    _, line = bench.make_records(results, done=True, elapsed_s=1.0)
    rec = json.loads(line)
    assert rec['floors_failed'] == ['unbinned']
    assert rec['complete'] is True   # a floor miss is a flag, not a failure


def test_errors_break_complete_flag(bench):
    results = _r4_results()
    results['band'] = dict(error="RuntimeError('boom')")
    _, line = bench.make_records(results, done=True, elapsed_s=1.0)
    rec = json.loads(line)
    assert rec['complete'] is False
    assert 'band' in rec['floors_failed']


def test_line_stays_compact_under_error_spam(bench):
    # Worst case: every scenario errored with a long repr — the guard drops
    # the scenarios map rather than ever exceeding the driver tail
    results = {name: dict(error='E' * 400) for name in bench.FLOORS}
    results['gauss'] = dict(fits_per_sec=1.0, vs_baseline=1.0)
    _, line = bench.make_records(results, done=True, elapsed_s=1.0)
    assert len(line) < 1500
    json.loads(line)


def test_floors_cover_all_throughput_scenarios(bench):
    assert set(bench.FLOORS) == {
        'gauss', 'unbinned', 'xenon', 'unbinned_xenon', 'bb', 'bblite',
        'band', 'mcmc'}
