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


def test_folder_layer_entry_records_state_in_folder_layer(env):
    # an entry DECLARED at folder level must get its recorded state
    # (files/data_path) written back to the folder file — writing it to
    # the user layer would be shadowed by the folder merge, so every
    # get() would re-download and remove() would see no copies
    dsm, tmp_path, url, sha = env
    dsm.DatasetsManager.add(
        "FolderDS", {"url": url, "sha256": sha}, levels=("folder",),
    )
    d = dsm.Dataset()
    got = d.get("FolderDS", root_dir=str(tmp_path / "cache5"))
    folder_reg = json.load(open(dsm.DatasetsManager.json_path("folder")))
    assert got in folder_reg["FolderDS"]["data_path"]
    assert folder_reg["FolderDS"]["files"]
    # and the record is actually SEEN: a fresh instance reuses the cache
    d2 = dsm.Dataset()
    d2._download = None  # would raise if touched
    assert d2.get("FolderDS") == got
    # remove() sees the copies and clears the folder-layer record
    d2.remove("FolderDS")
    assert not os.path.exists(got)
    folder_reg = json.load(open(dsm.DatasetsManager.json_path("folder")))
    assert folder_reg["FolderDS"]["data_path"] == []


def test_extract_sanitizes_hostile_archive_names(env):
    # zipfile.extract strips absolute paths and '..' segments; the
    # skip/utime bookkeeping must follow the SANITIZED path, never the
    # raw join (which for '/etc/x' discards the cache dir entirely)
    dsm, tmp_path, _url, _sha = env
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("/abs/esc.txt", "escape")
        zf.writestr("../up.txt", "up")
        zf.writestr("ok/inner.txt", "fine")
    sha = hashlib.sha256(evil.read_bytes()).hexdigest()
    dsm.DatasetsManager.add(
        "Evil", {"url": evil.as_uri(), "sha256": sha},
    )
    d = dsm.Dataset()
    got = d.get("Evil", root_dir=str(tmp_path / "cache6"))
    # every extracted file landed INSIDE the cache dir
    assert open(os.path.join(got, "abs", "esc.txt")).read() == "escape"
    assert open(os.path.join(got, "up.txt")).read() == "up"
    assert open(os.path.join(got, "ok", "inner.txt")).read() == "fine"
    assert not os.path.exists(tmp_path / "up.txt")
    reg = json.load(open(dsm.DatasetsManager.json_path("user")))
    assert sorted(reg["Evil"]["files"]) == [
        "abs/esc.txt", "ok/inner.txt", "up.txt",
    ]


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
