"""The documentation's Python snippets must at least be valid Python.

A fenced block that does not compile (e.g. the once-shipped
``dict(name='bg', class=Foo)`` — ``class`` is a reserved word) breaks the
first thing a new user copies. Deliberately fragmentary lines use ``...``;
blocks whose only syntax offense is such an ellipsis line are allowed.
"""

import os
import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
DOCS = sorted([REPO / 'README.md'] + list((REPO / 'docs').glob('*.md')))

FENCE = re.compile(r'```python\n(.*?)```', re.DOTALL)


def _blocks():
    out = []
    for path in DOCS:
        for i, m in enumerate(FENCE.finditer(path.read_text())):
            out.append(pytest.param(m.group(1),
                                    id='%s-block%d' % (path.name, i)))
    return out


@pytest.mark.parametrize('code', _blocks())
def test_doc_snippet_is_valid_python(code):
    try:
        compile(code, '<doc snippet>', 'exec')
    except SyntaxError as e:
        line = code.splitlines()[e.lineno - 1] if e.lineno else ''
        if '...' in line:
            pytest.skip('deliberately fragmentary snippet line: %r' % line)
        raise


def test_docs_were_found():
    assert len(DOCS) >= 4 and len(_blocks()) >= 8


def test_api_reference_is_current():
    """docs/api.md must match a fresh regeneration from the live package —
    the generated API reference cannot rot (VERDICT r3 #7)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'gen_api', REPO / 'docs' / 'gen_api.py')
    gen_api = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_api)
    fresh = gen_api.generate()
    committed = (REPO / 'docs' / 'api.md').read_text()
    assert fresh == committed, (
        "docs/api.md is stale - regenerate with: python docs/gen_api.py")


def test_api_reference_symbols_import():
    """Every module section heading in api.md must import, and every bold
    symbol it lists must exist in that module."""
    import importlib
    text = (REPO / 'docs' / 'api.md').read_text()
    mod = None
    n_checked = 0
    for line in text.splitlines():
        m = re.match(r'### `([\w.]+)`', line)
        if m:
            mod = importlib.import_module(m.group(1))
            continue
        m = re.match(r'- \*\*`(\w+)', line)
        if m and mod is not None:
            assert hasattr(mod, m.group(1)), (mod.__name__, m.group(1))
            n_checked += 1
    assert n_checked > 100, "api.md listed suspiciously few symbols"


@pytest.mark.slow
def test_walkthrough_executes(tmp_path):
    """The walkthrough's code blocks, concatenated in order, must RUN (not
    merely compile) as one analysis script — the narrated story is the
    first thing a new user follows."""
    import subprocess
    import sys
    code = '\n'.join(m.group(1) for m in FENCE.finditer(
        (REPO / 'docs' / 'walkthrough.md').read_text()))
    script = tmp_path / 'walkthrough.py'
    script.write_text(code)
    env = dict(os.environ, PYTHONPATH=str(REPO))
    # Pure-CPU child (same pitfall as tests/conftest.py: platform choice
    # must happen before the first backend query in the child)
    for trigger in ('PALLAS_AXON_POOL_IPS', 'TPU_LIBRARY_PATH',
                    'PJRT_LIBRARY_PATH'):
        env.pop(trigger, None)
    proc = subprocess.run([sys.executable, str(script)], cwd=tmp_path,
                          env=env, capture_output=True, text=True,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
