"""docs/WALKTHROUGH.md claims every block is runnable as-is — hold it
to that: execute all python blocks verbatim in one namespace."""

from __future__ import annotations

import contextlib
import io
import re


def test_walkthrough_blocks_execute(spark):
    src = "\n".join(
        re.findall(
            r"```python\n(.*?)```", open("docs/WALKTHROUGH.md").read(), re.S
        )
    )
    # the doc creates its own session via get_spark(); under pytest it
    # resolves to the shared fixture session (same JVM), so no extra
    # cluster spins up
    with contextlib.redirect_stdout(io.StringIO()):
        exec(compile(src, "WALKTHROUGH.md", "exec"), {})
