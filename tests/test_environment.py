"""§2.8 environment-discovery surface: session access, path resolution,
project-folder walk, dbutils gating (reference environment_utils.py:18-166)."""

import os

import pytest

from hds_functions_spark.sources.environment import (
    find_project_folder,
    get_dbutils,
    get_spark_session,
    resolve_path,
)


def test_get_spark_session_reuses_active(spark):
    assert get_spark_session() is spark


def test_resolve_path_absolute_passthrough():
    assert resolve_path("/etc/hosts") == "/etc/hosts"


def test_resolve_path_project_relative(monkeypatch, tmp_path):
    monkeypatch.setenv("PROJECT_FOLDER", str(tmp_path))
    assert resolve_path("./conf/x.json") == str(tmp_path / "conf" / "x.json")
    monkeypatch.delenv("PROJECT_FOLDER")
    assert resolve_path("./y.json") == os.path.join(os.getcwd(), "y.json")


def test_resolve_path_package_relative():
    got = resolve_path("operators/cohort.py", repo="hds_functions_spark")
    assert got.endswith("hds_functions_spark/operators/cohort.py")
    assert os.path.exists(got)
    with pytest.raises(AssertionError, match="repo"):
        resolve_path("no/prefix.json")


def test_find_project_folder_walks_up(monkeypatch, tmp_path):
    (tmp_path / ".dbxproj").touch()
    nested = tmp_path / "a" / "b"
    nested.mkdir(parents=True)
    monkeypatch.setenv("PROJECT_FOLDER", str(nested))
    assert find_project_folder() == str(tmp_path)
    # custom marker + not-found at filesystem root
    monkeypatch.setenv("PROJECT_FOLDER", str(nested))
    with pytest.raises(FileNotFoundError, match="no_such_marker"):
        find_project_folder(marker_file="no_such_marker")


def test_get_dbutils_outside_databricks(spark):
    assert get_dbutils(spark) is None  # feature-gate default
    with pytest.raises(RuntimeError, match="dbutils is not available"):
        get_dbutils(spark, strict=True)  # reference parity mode


class _FakeDbutils:
    """Fake of the dbutils.notebook.entry_point context-chain the
    reference walks (environment_utils.py:98-107)."""

    def __init__(self, notebook_path: str):
        class _Path:
            def __init__(self, p): self._p = p
            def get(self): return self._p

        class _Context:
            def __init__(self, p): self._p = p
            def notebookPath(self): return _Path(self._p)

        class _Notebook2:
            def __init__(self, p): self._p = p
            def getContext(self): return _Context(self._p)

        class _Inner:
            def __init__(self, p): self._p = p
            def notebook(self): return _Notebook2(self._p)

        class _EntryPoint:
            def __init__(self, p): self._p = p
            def getDbutils(self): return _Inner(self._p)

        class _NotebookNS:
            def __init__(self, p): self.entry_point = _EntryPoint(p)

        self.notebook = _NotebookNS(notebook_path)


def test_find_project_folder_notebook_path_branch(tmp_path):
    # workspace layout: <ws>/Users/alice/my_project/{.dbxproj,notebooks/}
    proj = tmp_path / "Users" / "alice" / "my_project"
    (proj / "notebooks").mkdir(parents=True)
    (proj / ".dbxproj").touch()
    fake = _FakeDbutils("/Users/alice/my_project/notebooks/analysis")
    got = find_project_folder(
        workspace_prefix=str(tmp_path), dbutils=fake
    )
    assert got == str(proj)


def test_find_project_folder_notebook_path_not_found(tmp_path):
    (tmp_path / "Users" / "bob" / "nb").mkdir(parents=True)
    fake = _FakeDbutils("/Users/bob/nb/analysis")
    with pytest.raises(FileNotFoundError, match="not found in any parent"):
        find_project_folder(workspace_prefix=str(tmp_path), dbutils=fake)


def test_find_project_folder_notebook_path_skips_unreadable(tmp_path):
    # the notebook's own folder does not exist on the driver (common:
    # workspace paths are not locally mounted below the repo root) —
    # the walk must skip it and still find the marker above
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / ".dbxproj").touch()
    fake = _FakeDbutils("/proj/not_mounted/deeper/analysis")
    got = find_project_folder(workspace_prefix=str(tmp_path), dbutils=fake)
    assert got == str(proj)
