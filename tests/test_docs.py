"""The documentation's Python snippets must at least be valid Python.

A fenced block that does not compile (e.g. the once-shipped
``dict(name='bg', class=Foo)`` — ``class`` is a reserved word) breaks the
first thing a new user copies. Deliberately fragmentary lines use ``...``;
blocks whose only syntax offense is such an ellipsis line are allowed.
"""

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
