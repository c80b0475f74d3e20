"""Documentation code must keep working (the reference runs its doc examples too:
/root/reference/tests/test_doc.py test_example_code).

Every ```python block in docs/*.md is syntax-compiled; the quick-start page — the first
thing a new user copies — is executed end-to-end on the cropped test data.
"""

import pathlib
import re

import numpy as np
import pytest

DOCS = pathlib.Path(__file__).parent.parent / "docs"

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _python_blocks(path: pathlib.Path) -> list[str]:
    return _BLOCK_RE.findall(path.read_text())


@pytest.mark.parametrize("page", sorted(DOCS.glob("*.md")), ids=lambda p: p.name)
def test_docs_python_blocks_compile(page):
    for i, block in enumerate(_python_blocks(page)):
        compile(block, f"{page.name}[block {i}]", "exec")


def test_quick_start_page_runs(tmp_path, monkeypatch):
    """The quick-start code block executes verbatim (on the cropped example pair)."""
    import xdem_tpu.examples as ex

    blocks = _python_blocks(DOCS / "quick_start.md")
    assert blocks, "quick_start.md lost its python block"
    monkeypatch.chdir(tmp_path)  # the block saves dh.tif/sigma_dh.tif
    monkeypatch.setattr(ex, "get_path", ex.get_path_test)
    ns: dict = {}
    exec(compile(blocks[0], "quick_start.md[block 0]", "exec"), ns)
    # The pipeline should have recovered the bulk of the true shift
    dh = ns["dh"]
    assert abs(float(np.nanmedian(np.asarray(dh.data)))) < 1.0
    assert (tmp_path / "dh.tif").exists() and (tmp_path / "sigma_dh.tif").exists()
