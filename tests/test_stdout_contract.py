"""bench.py stdout contract: JSON lines only.

The driver parses bench.py's stdout (one full JSON line + one compact
JSON line).  A round-9 regression put the session factory's code-cache
diagnostic on stdout ahead of the JSON, which would have broken the
driver's parse; diagnostics belong on stderr.  This pins the contract
at the source: creating a SparkSession through ``get_spark`` must write
NOTHING to stdout.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from flink_crawler_spark.session import get_spark
spark = get_spark("stdout_contract", cpus=2)
spark.stop()
"""


def test_get_spark_writes_nothing_to_stdout():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # py4j/log4j noise goes to stderr; stdout must stay empty so the
    # driver's json.loads(line) never sees a diagnostic
    assert proc.stdout.strip() == "", f"stdout polluted: {proc.stdout[:500]!r}"
    # and the diagnostic itself must still be emitted (on stderr)
    assert "JVM code cache reserved" in proc.stderr
