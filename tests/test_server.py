"""Thrift/JDBC entry point end to end: a REAL beeline JDBC client over a
real socket against the in-process HiveServer2 endpoint — the
``start-thriftserver.sh`` path of the reference (spark/entrypoint.sh:23,
SURVEY §3.1). One test, because the thrift server is once-per-JVM."""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeshed.io import load_star
from lakeshed.server import (
    beeline_env,
    beeline_path,
    free_port,
    publish,
    start_thrift_server,
)

SF = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")


def _beeline(port: int, sql: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [beeline_path(), "-u", f"jdbc:hive2://localhost:{port}",
         "--silent=true", "-e", sql],
        capture_output=True, text=True, timeout=180, env=beeline_env(),
    )


def test_jdbc_client_queries_published_frame(spark):
    port = free_port()
    start_thrift_server(spark, port)

    # a lakeshed star table published across the session boundary
    name = publish(
        load_star(spark, SF, "nation")["nation"], "nation_jdbc"
    )
    assert name == "global_temp.nation_jdbc"

    # wait for the listener, then run a real aggregation over JDBC
    deadline = time.time() + 60
    out = None
    while time.time() < deadline:
        out = _beeline(
            port,
            "SELECT count(*) AS n, min(n_nationkey) AS lo "
            f"FROM {name}",
        )
        if out.returncode == 0:
            break
        time.sleep(2)
    assert out is not None and out.returncode == 0, (out.stdout, out.stderr)
    assert "25" in out.stdout and "| 0" in out.stdout.replace("| 0 ", "| 0")

    # per-connection isolation contract: a plain (non-global) temp view
    # of the host session is NOT visible to a fresh JDBC session
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "host_only_view"
    )
    out2 = _beeline(port, "SELECT * FROM host_only_view")
    assert out2.returncode != 0
