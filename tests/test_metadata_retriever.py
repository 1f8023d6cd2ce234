"""SciCat metadata retriever tests — the transport is injected, so the
URL construction, old-format fallback, token persistence, and failure
isolation all run offline (reference surface:
``src/sed/loader/flash/metadata.py:1-146``). No Spark session."""

from __future__ import annotations

import json
import urllib.error

import pytest


@pytest.fixture()
def env_store(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "conf"))
    monkeypatch.delenv("SCICAT_TOKEN", raising=False)
    return tmp_path


def _retriever(opener, token="tok123"):
    from sed_spark.loader.metadata import MetadataRetriever

    return MetadataRetriever(
        {"archiver_url": "https://scicat.example/api/v3"},
        token=token,
        opener=opener,
    )


def test_get_metadata_merges_runs_and_builds_new_urls(env_store):
    calls = []

    def opener(url, headers, timeout):
        calls.append((url, headers["Authorization"]))
        run = url.rsplit("%2F", 1)[-1]
        return json.dumps({f"k{run}": int(run), "shared": int(run)}).encode()

    md = _retriever(opener).get_metadata("11013410", [43, 44], {"pre": 1})
    assert md == {"pre": 1, "k43": 43, "k44": 44, "shared": 44}
    assert calls[0][0] == (
        "https://scicat.example/api/v3/Datasets/11013410%2F43"
    )
    assert calls[0][1] == "Bearer tok123"


def test_empty_body_falls_back_to_old_url_format(env_store):
    calls = []

    def opener(url, headers, timeout):
        calls.append(url)
        if "/Datasets/%2F" in url:  # legacy form answers
            return b'{"legacy": true}'
        return b""  # new form: empty object from an older SciCat

    md = _retriever(opener).get_metadata("bt", ["7"])
    assert md == {"legacy": True}
    assert calls == [
        "https://scicat.example/api/v3/Datasets/bt%2F7",
        "https://scicat.example/api/v3/Datasets/%2Fbt%2F7",
    ]


def test_failed_run_contributes_nothing_but_others_survive(env_store):
    def opener(url, headers, timeout):
        if url.endswith("%2F1"):
            raise urllib.error.URLError("boom")
        return b'{"ok": 2}'

    md = _retriever(opener).get_metadata("bt", [1, 2])
    assert md == {"ok": 2}


def test_token_persisted_and_reloaded_from_env_store(env_store):
    from sed_spark.config import read_env_var
    from sed_spark.loader.metadata import MetadataRetriever

    _retriever(lambda *a: b"{}", token="persist-me")
    assert read_env_var("SCICAT_TOKEN") == "persist-me"
    # a later construction without a token resolves it from the store
    r = MetadataRetriever(
        {"archiver_url": "https://scicat.example"}, opener=lambda *a: b"{}",
    )
    assert r.token == "persist-me"


def test_token_store_is_owner_only(env_store):
    # the .env file holds bearer tokens — it must never be group/world
    # readable (0600 file, 0700 dir), including after a rewrite of an
    # existing file (O_CREAT mode doesn't retighten an existing one)
    import os
    import stat

    from sed_spark.config import _env_file_path, save_env_var

    save_env_var("SCICAT_TOKEN", "secret-1")
    path = _env_file_path()
    os.chmod(path, 0o644)  # simulate a pre-fix loose file
    save_env_var("SCICAT_TOKEN", "secret-2")
    assert stat.S_IMODE(os.stat(path).st_mode) == 0o600
    assert stat.S_IMODE(os.stat(os.path.dirname(path)).st_mode) == 0o700


def test_validation_errors(env_store):
    from sed_spark.loader.metadata import MetadataRetriever

    with pytest.raises(ValueError, match="Token is required"):
        MetadataRetriever({"archiver_url": "https://x"}, opener=lambda *a: b"")
    with pytest.raises(ValueError, match="No URL"):
        MetadataRetriever({}, token="t", opener=lambda *a: b"")
