"""Thrift/JDBC SQL entry point — the reference's ``start-thriftserver.sh``.

The reference stack launches Spark's HiveServer2-protocol endpoint next to
the notebook session (``spark/entrypoint.sh:23``), and SURVEY §3.1 notes
external JDBC clients cross a socket boundary into the SAME session path
(parse → analyze → optimize → execute). VERDICT r04 listed this as the one
reference entry point with no repo analog — pyspark ships the
``spark-hive-thriftserver`` jar, so the endpoint can be served in-process
from the running session; no external daemon needed.

Session-state contract (Spark semantics, worth spelling out): each JDBC
connection gets its OWN session state, so plain temp views made by the
host session are not visible across the wire. Share a frame with clients
via :func:`publish` (a GLOBAL temp view, visible to every session as
``global_temp.<name>``) or a catalog table. The end-to-end test drives a
real ``beeline`` JDBC client against the socket
(``tests/test_server.py``).
"""

from __future__ import annotations

import os
import socket

from pyspark.sql import DataFrame, SparkSession


def free_port() -> int:
    """An ephemeral localhost port (test/demo convenience)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def start_thrift_server(spark: SparkSession, port: int = 10000):
    """Serve this session over the HiveServer2 thrift protocol on
    ``port`` — JDBC/ODBC clients (beeline, DBeaver, BI tools) connect
    with ``jdbc:hive2://host:port``. Returns the server handle (it has
    ``stop()``); the server runs on JVM daemon threads, so the Python
    process exits normally either way."""
    spark.sql(f"SET hive.server2.thrift.port={port}")
    return (
        spark._jvm.org.apache.spark.sql.hive.thriftserver
        .HiveThriftServer2.startWithContext(
            spark._jsparkSession.sqlContext()
        )
    )


def publish(df: DataFrame, name: str) -> str:
    """Expose ``df`` to every thrift/JDBC session as a GLOBAL temp view;
    returns the name clients should query (``global_temp.<name>``)."""
    df.createOrReplaceGlobalTempView(name)
    return f"global_temp.{name}"


def beeline_path() -> str:
    """The bundled beeline launcher (needs SPARK_HOME pointing at the
    pyspark distribution — see :func:`beeline_env`)."""
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")


def beeline_env() -> dict[str, str]:
    import pyspark

    return dict(os.environ, SPARK_HOME=os.path.dirname(pyspark.__file__))
