"""Environment discovery helpers: session access, path resolution.

Parity target: ``/root/reference`` ``environment_utils.py:18-166``. The
Databricks-coupled surface (``find_project_folder``, ``get_dbutils``) is
gated behind import-tries so the library works in any Spark environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = [
    "get_spark_session",
    "resolve_path",
    "find_project_folder",
    "get_dbutils",
]


def get_spark_session() -> SparkSession:
    """Active (or new) SparkSession with scale-oriented defaults.

    Unlike the reference's bare ``getOrCreate`` (``environment_utils.py:18-32``)
    this enables Adaptive Query Execution — runtime partition coalescing and
    skew-join splitting — which the whole library relies on for sane shuffle
    behaviour at large scale. Existing sessions are reused untouched.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return (
        SparkSession.builder.appName("hds_functions_spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )


def resolve_path(path: str, repo: str | None = None) -> str:
    """Resolve a config-file path (reference ``environment_utils.py:35-72``).

    Three mutually exclusive cases:
    - absolute path -> returned as-is;
    - ``./``-relative -> resolved against the ``PROJECT_FOLDER`` env var
      (falling back to the current working directory);
    - otherwise requires ``repo`` -> resolved against that installed
      package's directory (``importlib.resources``).
    """
    if os.path.isabs(path):
        return path
    if path.startswith("./"):
        project_folder = os.environ.get("PROJECT_FOLDER", os.getcwd())
        return os.path.join(project_folder, path[2:])
    if repo is None:
        raise AssertionError(
            "Relative paths without a './' prefix require the 'repo' argument "
            "naming an installed package."
        )
    from importlib import resources

    return str(resources.files(repo).joinpath(path))


def find_project_folder(
    marker_file: str = ".dbxproj",
    workspace_prefix: str = "/Workspace",
    dbutils=None,
) -> str:
    """Locate the project root by searching upward for ``marker_file``.

    Full parity with the reference (``environment_utils.py:75-127``):
    when a ``dbutils`` handle is available — injected via the ``dbutils``
    argument (testable with a fake), or discoverable from the active
    session — the search starts from the Databricks NOTEBOOK path
    (``workspace_prefix`` + the notebook's folder, read from the
    notebook context), skips unreadable directories, and raises
    FileNotFoundError on reaching the workspace root. Outside Databricks
    this generalises to walking up from ``$PROJECT_FOLDER`` or the CWD.
    """
    if dbutils is None:
        active = SparkSession.getActiveSession()
        if active is not None:
            dbutils = get_dbutils(active)
    if dbutils is not None:
        context = (
            dbutils.notebook.entry_point.getDbutils().notebook().getContext()
        )
        notebook_folder = (
            f"{workspace_prefix}{os.path.dirname(context.notebookPath().get())}"
        )
        current = notebook_folder
        while True:
            if current in ("", "/"):
                raise FileNotFoundError(
                    f"Marker file '{marker_file}' not found in any parent "
                    f"directories of {notebook_folder}."
                )
            try:
                if marker_file in os.listdir(current):
                    return current
            except (FileNotFoundError, PermissionError, NotADirectoryError):
                pass  # skip inaccessible levels, keep walking up
            current = os.path.dirname(current)
    # non-Databricks generalisation: walk up from $PROJECT_FOLDER / CWD
    start = os.environ.get("PROJECT_FOLDER", os.getcwd())
    current = os.path.abspath(start)
    while True:
        if os.path.exists(os.path.join(current, marker_file)):
            return current
        parent = os.path.dirname(current)
        if parent == current:
            raise FileNotFoundError(
                f"No '{marker_file}' marker found walking up from {start}."
            )
        current = parent


def get_dbutils(spark: SparkSession, strict: bool = False):
    """Databricks ``dbutils`` handle, or None outside Databricks.

    Parity: reference ``environment_utils.py:130-166`` (DBUtils, then the
    IPython user-namespace fallback). Default deviation: returns None
    instead of raising so callers can feature-gate; ``strict=True``
    restores the reference's raise-on-missing behaviour exactly.
    """
    try:  # pragma: no cover - Databricks only
        from pyspark.dbutils import DBUtils  # type: ignore

        return DBUtils(spark)
    except ImportError:
        try:  # pragma: no cover - notebook only
            import IPython

            return IPython.get_ipython().user_ns["dbutils"]
        except Exception:
            if strict:
                raise RuntimeError(
                    "dbutils is not available: neither pyspark.dbutils "
                    "(Databricks runtime) nor an IPython user namespace "
                    "exposing 'dbutils' was found."
                )
            return None
