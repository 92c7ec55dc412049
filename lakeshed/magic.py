"""``%%sql`` cell magic (C5) — the notebook entry point of the reference.

The reference routes SQL cells through an IPython magic into
``spark.sql`` with a display row limit and ``--var`` capture
(``spark/ipython/startup/00-prettytables.py:56-81`` — behavior studied,
not copied). Here the cell routes through :meth:`lakeshed.catalog.
Catalog.sql`, so lakehouse DDL/DML and metadata relations work from
notebooks too. Import-gated: the module is importable without IPython;
``register_magics`` needs it.

Usage::

    from lakeshed.magic import register_magics
    register_magics(catalog)          # then:
    %%sql --limit 50 --var out
    SELECT * FROM nyc.taxis.snapshots
"""

from __future__ import annotations

import shlex

from lakeshed.catalog import Catalog


def register_magics(catalog: Catalog) -> None:
    try:
        from IPython.core.getipython import get_ipython
        from IPython.core.interactiveshell import InteractiveShell
        from IPython.core.magic import needs_local_scope
    except ImportError as e:
        raise RuntimeError(
            "IPython is required for %%sql; use catalog.sql(...) directly"
        ) from e
    shell = get_ipython() or InteractiveShell.instance()

    @needs_local_scope
    def sql(line: str, cell: str, local_ns=None):
        args = shlex.split(line or "")
        limit, var = 20, None
        i = 0
        while i < len(args):
            if args[i] == "--limit" and i + 1 < len(args):
                limit = int(args[i + 1])
                i += 2
            elif args[i] == "--var" and i + 1 < len(args):
                var = args[i + 1]
                i += 2
            else:
                i += 1
        df = catalog.sql(cell.format(**(local_ns or {})))
        if df is None:
            return None
        if var is not None and local_ns is not None:
            local_ns[var] = df
        return df.limit(limit).toPandas()

    shell.register_magic_function(sql, "cell", "sql")