"""Smoke-run the combined multi-run demo end to end (tiny toy count)."""

import os
import runpy
import sys

_DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'combined_runs_demo.py')


def test_combined_runs_demo(monkeypatch, capsys, tmp_path):
    # chdir: the demo sources use the default relative cache/task dirs
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, 'argv', ['combined_runs_demo.py', '16'])
    runpy.run_path(_DEMO, run_name='__main__')
    out = capsys.readouterr().out
    assert 'joint bestfit' in out
    assert 'UL on signal_rate_multiplier' in out
    assert 'done.' in out


_OBS_DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'observed_analysis_demo.py')


def test_observed_analysis_demo(monkeypatch, capsys, tmp_path):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, 'argv', ['observed_analysis_demo.py', '11'])
    runpy.run_path(_OBS_DEMO, run_name='__main__')
    out = capsys.readouterr().out
    assert '90% UL' in out and '68% central' in out
    assert 'done.' in out


_SYS_DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'systematics_demo.py')


def test_systematics_demo(monkeypatch, capsys, tmp_path):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, 'argv', ['systematics_demo.py', '24'])
    runpy.run_path(_SYS_DEMO, run_name='__main__')
    out = capsys.readouterr().out
    assert 'effective MC counts' in out
    assert 'all 32 bins positive' in out
    assert 'joint bestfit' in out
    assert 'correlation across toys' in out
    assert 'done.' in out
