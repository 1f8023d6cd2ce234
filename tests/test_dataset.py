"""Dataset fetcher tests — the full download/extract/reuse path driven
offline through ``file://`` URLs (reference surface:
``src/sed/dataset/dataset.py:103-420``). No Spark session involved."""

from __future__ import annotations

import hashlib
import json
import os
import zipfile

import pytest


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Isolated registry layers + cwd, and a served zip fixture."""
    import sed_spark.dataset as dsm

    monkeypatch.setattr(
        dsm, "USER_CONFIG_DIR", str(tmp_path / "userconf"),
    )
    monkeypatch.chdir(tmp_path)  # folder layer = tmp_path/datasets.json

    zip_path = tmp_path / "fixture.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("Scan01/a.txt", "alpha")
        zf.writestr("Scan01/b.txt", "beta")
        zf.writestr("cal/c.txt", "gamma")
    sha = hashlib.sha256(zip_path.read_bytes()).hexdigest()
    return dsm, tmp_path, zip_path.as_uri(), sha


def test_get_downloads_extracts_and_reuses(env):
    dsm, tmp_path, url, sha = env
    dsm.DatasetsManager.add(
        "Fixture",
        {"url": url, "subdirs": ["Scan01"], "sha256": sha},
    )
    d = dsm.Dataset()
    assert "Fixture" in d.available
    assert "WSe2" in d.available  # built-ins still visible through layers

    got = d.get("Fixture", root_dir=str(tmp_path / "cache"))
    assert got == d.dir
    assert open(os.path.join(got, "Scan01", "a.txt")).read() == "alpha"
    assert open(os.path.join(got, "cal", "c.txt")).read() == "gamma"
    assert d.subdirs == [os.path.join(got, "Scan01")]
    assert not os.path.exists(os.path.join(got, "Fixture.zip"))  # remove_zip

    # the user registry recorded files + data_path
    reg = json.load(open(dsm.DatasetsManager.json_path("user")))
    assert got in reg["Fixture"]["data_path"]
    assert "cal/c.txt" in reg["Fixture"]["files"]

    # second get() must REUSE the cache: poison _download to prove it
    d2 = dsm.Dataset()
    d2._download = None  # would raise if touched
    assert d2.get("Fixture") == got


def test_checksum_mismatch_removes_archive_and_raises(env):
    dsm, tmp_path, url, _sha = env
    dsm.DatasetsManager.add(
        "Bad", {"url": url, "sha256": "0" * 64},
    )
    d = dsm.Dataset()
    with pytest.raises(ValueError, match="checksum mismatch"):
        d.get("Bad", root_dir=str(tmp_path / "cache2"))
    # the poisoned archive must not survive to seed a broken resume
    assert not os.path.exists(
        os.path.join(tmp_path, "cache2", "datasets", "Bad", "Bad.zip"),
    )


def test_rearrange_files_flattens_subdirs(env):
    dsm, tmp_path, url, sha = env
    dsm.DatasetsManager.add(
        "Flat",
        {"url": url, "subdirs": ["Scan01"], "sha256": sha,
         "rearrange_files": True},
    )
    d = dsm.Dataset()
    got = d.get("Flat", root_dir=str(tmp_path / "cache3"))
    assert open(os.path.join(got, "a.txt")).read() == "alpha"
    assert not os.path.isdir(os.path.join(got, "Scan01"))
    assert d.subdirs == []  # flattened away, like the reference


def test_remove_deletes_copies_and_updates_registry(env):
    dsm, tmp_path, url, sha = env
    dsm.DatasetsManager.add("Gone", {"url": url, "sha256": sha})
    d = dsm.Dataset()
    got = d.get("Gone", root_dir=str(tmp_path / "cache4"))
    assert os.path.isdir(got)
    d.remove("Gone")
    assert not os.path.exists(got)
    reg = json.load(open(dsm.DatasetsManager.json_path("user")))
    assert reg["Gone"]["data_path"] == []


def test_registry_validation(env):
    dsm, _tmp, url, _sha = env
    with pytest.raises(ValueError, match="url"):
        dsm.DatasetsManager.add("NoUrl", {"subdirs": []})
    dsm.DatasetsManager.add("Dup", {"url": url})
    with pytest.raises(ValueError, match="already exists"):
        dsm.DatasetsManager.add("Dup", {"url": url})
    d = dsm.Dataset()
    with pytest.raises(ValueError, match="not available"):
        d.get("NeverHeardOfIt")
    with pytest.raises(ValueError, match="unknown registry level"):
        dsm.DatasetsManager.json_path("system")
