"""Deploy-unit checks for the installable package (pyproject.toml).

The reference ships as an installable package (/root/reference/setup.py:1-13,
built as an egg and pushed to executors via sc.addPyFile). The Spark-native
deploy unit is a wheel for spark-submit --py-files; these tests keep the
metadata honest without network or environment mutation (the sandbox has no
`wheel` module, so a real `pip install` is exercised only when available):

  * the metadata parses and carries the fields a wheel build needs;
  * setuptools package discovery under the configured include/exclude picks
    up EVERY directory that holds engine code (a missing __init__.py would
    silently drop a subpackage from the wheel);
  * the package imports from a bare COPY of the package directory — the
    exact content set a wheel would contain — from a foreign cwd, which
    catches repo-root-relative paths and test-only imports in library code;
  * the console entry point resolves to a callable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "cliqz_etl_spark")


def _meta() -> dict:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_metadata_complete():
    meta = _meta()
    proj = meta["project"]
    assert proj["name"] == "cliqz_etl_spark"
    assert proj["version"]
    assert proj["requires-python"]
    assert "setuptools" in meta["build-system"]["requires"][0]
    assert meta["build-system"]["build-backend"] == "setuptools.build_meta"
    # the CLI ships as a console script pointing at the tested main()
    assert proj["scripts"]["cliqz-etl-spark"] == "cliqz_etl_spark.cli:main"
    # pyspark must NOT be a hard dependency (cluster runtimes provide it;
    # a wheel that pins its own pyspark breaks executor images)
    assert all("pyspark" not in d for d in proj.get("dependencies", []))
    assert any("pyspark" in d
               for d in proj["optional-dependencies"]["local"])


def test_package_discovery_covers_every_code_dir():
    """find_packages under the configured include/exclude must return every
    directory that contains .py files beneath cliqz_etl_spark/ — i.e. no
    subpackage can silently fall out of the wheel for lack of __init__.py."""
    from setuptools import find_packages

    meta = _meta()["tool"]["setuptools"]["packages"]["find"]
    found = set(find_packages(
        where=REPO, include=meta["include"], exclude=meta["exclude"]))
    expected = set()
    for dirpath, _dirs, files in os.walk(PKG):
        if any(f.endswith(".py") for f in files):
            rel = os.path.relpath(dirpath, REPO)
            if "__pycache__" not in rel:
                expected.add(rel.replace(os.sep, "."))
    missing = expected - found
    assert not missing, (
        f"code directories invisible to the wheel build (missing "
        f"__init__.py or excluded): {sorted(missing)}")


def test_imports_from_bare_package_copy(tmp_path):
    """Simulate the installed layout: copy ONLY the package directory (what
    a wheel contains) somewhere else, cd away from the repo, and import the
    CLI + the full query registry. Fails if any library module reaches for
    repo-root files or the tests package at import time."""
    site = tmp_path / "site"
    site.mkdir()
    shutil.copytree(PKG, site / "cliqz_etl_spark",
                    ignore=shutil.ignore_patterns("__pycache__"))
    env = dict(os.environ, PYTHONPATH=str(site))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import cliqz_etl_spark, cliqz_etl_spark.cli; "
         "from cliqz_etl_spark.queries import load_all, DRIVER_ORDER; "
         "reg = load_all(); "
         "assert len(reg) >= 200 and len(DRIVER_ORDER) == len(reg); "
         "p = cliqz_etl_spark.cli.build_parser(); "
         "print(len(reg))"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr
    assert int(proc.stdout.strip()) >= 200


def test_console_entry_point_resolves():
    from cliqz_etl_spark.cli import main
    assert callable(main)
    # argparse exits 2 on no subcommand — proves the parser wires up
    try:
        main([])
    except SystemExit as e:
        assert e.code == 2


def test_editable_install_when_toolchain_present(tmp_path):
    """The real `pip install` smoke test, run only where the wheel
    toolchain exists (the sandbox lacks the `wheel` module and must not
    install one); on a developer machine this is the end-to-end check."""
    import importlib.util
    import pytest

    if importlib.util.find_spec("wheel") is None:
        pytest.skip("wheel module unavailable in this environment")
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", str(tmp_path / "t"),
         REPO],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert (tmp_path / "t" / "cliqz_etl_spark").is_dir()
