"""docs/API.md must stay in sync with the packages' ``__all__`` exports."""

import os
import sys


def test_api_md_is_fresh():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_api_md

    committed = open(
        os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")
    ).read()
    assert gen_api_md.generate() == committed, (
        "docs/API.md is stale — run `python tools/gen_api_md.py`"
    )
