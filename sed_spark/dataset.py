"""Example-dataset fetcher (reference ``src/sed/dataset/dataset.py:1-420``).

Driver-side convenience: named public datasets (Zenodo archives of raw
beamtime files) are declared in a layered JSON registry, downloaded once
into a local cache directory, checksum-verified, extracted, and reused on
every later ``get`` — so tutorial notebooks can say ``dataset.get("WSe2")``
and hand the resulting folder to a loader.

Differences from the reference (deliberate, dependency-free):

- stdlib ``urllib`` instead of ``requests`` (``file://`` URLs work, which
  is also how the unit tests exercise the full path offline) and no
  ``tqdm`` progress bars;
- optional integrity check: a ``sha256`` key on a registry entry is
  verified after download (the reference trusts the transport);
- registry layers are plain JSON files merged folder > user > built-in
  (the reference routes this through its YAML config stack).

Everything here is driver-side file management — no Spark session is
involved until a loader reads the fetched files.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import shutil
import urllib.request
import zipfile
from datetime import datetime
from typing import Any

logger = logging.getLogger("sed_spark.dataset")

#: built-in registry: the reference's public example datasets
#: (src/sed/config/datasets.json) — Zenodo archives, stable DOIs
DEFAULT_DATASETS: dict[str, dict[str, Any]] = {
    "WSe2": {
        "url": "https://zenodo.org/record/6369728/files/WSe2.zip",
        "subdirs": ["Scan049_1", "energycal_2019_01_08"],
    },
    "Gd_W110": {
        "url": "https://zenodo.org/records/10658470/files/single_event_data.zip",
        "subdirs": ["analysis_data", "calibration_data"],
        "rearrange_files": True,
    },
    "W110": {
        "url": "https://zenodo.org/records/12609441/files/single_event_data.zip",
        "subdirs": ["analysis_data", "calibration_data"],
        "rearrange_files": True,
    },
    "Photon_peak": {
        "url": "https://zenodo.org/records/15011781/files/single_event_data.zip",
        "subdirs": ["analysis_data"],
        "rearrange_files": True,
    },
    "TaS2": {
        "url": "https://zenodo.org/records/10160182/files/TaS2.zip",
        "subdirs": ["Scan0121_1", "energycal_2020_07_20"],
    },
    "Au_Mica": {
        "url": "https://zenodo.org/records/13952965/files/Au_Mica_SXP.zip",
    },
}

USER_CONFIG_DIR = os.path.join(
    os.environ.get(
        "XDG_CONFIG_HOME", os.path.join(os.path.expanduser("~"), ".config"),
    ),
    "sed_spark",
)


class DatasetsManager:
    """Layered dataset registry (reference ``dataset.py:30-101``):
    ``./datasets.json`` (folder) overrides the user file which overrides
    the built-in table. ``add``/``remove`` edit the user or folder file;
    the built-in layer is immutable."""

    FILENAME = "datasets.json"

    @staticmethod
    def json_path(level: str) -> str:
        if level == "user":
            return os.path.join(USER_CONFIG_DIR, DatasetsManager.FILENAME)
        if level == "folder":
            return os.path.join(os.getcwd(), DatasetsManager.FILENAME)
        raise ValueError(f"unknown registry level {level!r} (user/folder)")

    @staticmethod
    def _load_json(path: str) -> dict:
        if not os.path.exists(path):
            return {}
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)

    @staticmethod
    def _save_json(path: str, data: dict) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(data, fh, indent=2, sort_keys=True)

    @staticmethod
    def load_datasets_dict() -> dict[str, dict]:
        """Merged registry, most specific layer wins per dataset name."""
        merged: dict[str, dict] = {
            k: dict(v) for k, v in DEFAULT_DATASETS.items()
        }
        for level in ("user", "folder"):
            for name, info in DatasetsManager._load_json(
                DatasetsManager.json_path(level),
            ).items():
                merged[name] = dict(info)
        return merged

    @staticmethod
    def add(
        data_name: str, info: dict, levels: tuple[str, ...] = ("user",),
    ) -> None:
        """Register a new dataset; raises if the name already exists at
        that level (reference ``dataset.py:64-85`` semantics)."""
        if "url" not in info:
            raise ValueError("dataset info must carry a 'url'")
        for level in levels:
            path = DatasetsManager.json_path(level)
            current = DatasetsManager._load_json(path)
            if data_name in current:
                raise ValueError(
                    f"Dataset {data_name} already exists in {level} "
                    f"{DatasetsManager.FILENAME}.",
                )
            current[data_name] = info
            DatasetsManager._save_json(path, current)
            logger.info("added dataset %s to %s registry", data_name, level)

    @staticmethod
    def remove(
        data_name: str, levels: tuple[str, ...] = ("user",),
    ) -> None:
        for level in levels:
            path = DatasetsManager.json_path(level)
            current = DatasetsManager._load_json(path)
            if data_name in current:
                del current[data_name]
                DatasetsManager._save_json(path, current)
                logger.info(
                    "removed dataset %s from %s registry", data_name, level,
                )


class Dataset:
    """Fetch-once dataset cache (reference ``dataset.py:103-420``).

    ``get(name)`` resolves the registry entry, reuses an existing local
    copy when every recorded file is still present, otherwise downloads
    the archive (resuming a partial download when the server honors
    Range), verifies the optional ``sha256``, extracts, optionally
    flattens the listed subdirs (``rearrange_files``), and records the
    file list + data path back into the user registry.
    """

    def __init__(self) -> None:
        self._datasets = DatasetsManager.load_datasets_dict()
        self._data_name: str | None = None
        self._source_level: str = "user"
        self._state: dict = {}
        self._dir: str | None = None
        self.dir: str | None = None
        self.subdirs: list[str] = []

    @property
    def available(self) -> list[str]:
        self._datasets = DatasetsManager.load_datasets_dict()
        return sorted(self._datasets)

    @property
    def data_name(self) -> str | None:
        return self._data_name

    @data_name.setter
    def data_name(self, value: str) -> None:
        self._datasets = DatasetsManager.load_datasets_dict()
        if value not in self._datasets:
            raise ValueError(
                f"Data '{value}' is not available for fetching.\n"
                f"Available datasets are: {sorted(self._datasets)}",
            )
        self._data_name = value
        self._state = dict(self._datasets[value])
        # which writable layer resolved this entry: recorded state
        # (files/data_path) must be written back to the SAME layer,
        # otherwise a folder-level declaration shadows the user-level
        # record and every get() re-downloads / remove() sees no copies.
        # Built-in entries record into the user layer (user > built-in
        # in the merge, so the record is seen next time).
        self._source_level = "user"
        for level in ("folder", "user"):  # folder wins the merge
            if value in DatasetsManager._load_json(
                DatasetsManager.json_path(level),
            ):
                self._source_level = level
                break

    @property
    def existing_data_paths(self) -> list[str]:
        if not self._data_name:
            raise ValueError("Data name not set.")
        return list(self._state.get("data_path", []))

    def _record_state(self) -> None:
        """Persist the entry's recorded state (files / data_path) into
        the registry layer it was RESOLVED from — writing it anywhere
        lower would be shadowed on the next merge (folder > user)."""
        path = DatasetsManager.json_path(self._source_level)
        registry = DatasetsManager._load_json(path)
        registry[str(self._data_name)] = self._state
        DatasetsManager._save_json(path, registry)

    def _set_data_dir(self, root_dir: str | None, use_existing: bool) -> None:
        existing = self.existing_data_paths
        if use_existing and existing:
            self._dir = os.path.abspath(existing[0])
        else:
            root = root_dir or os.getcwd()
            self._dir = os.path.abspath(
                os.path.join(root, "datasets", str(self._data_name)),
            )
        os.makedirs(self._dir, exist_ok=True)

    def _file_list(self, ignore_zip: bool = True) -> list[str]:
        assert self._dir is not None
        out = []
        for root, _, files in os.walk(self._dir):
            for name in files:
                if name.startswith("."):
                    continue
                if ignore_zip and name.endswith(".zip"):
                    continue
                out.append(
                    os.path.relpath(os.path.join(root, name), self._dir),
                )
        return sorted(out)

    def _download(self, url: str, chunk_size: int = 1 << 20) -> str:
        assert self._dir is not None
        zip_path = os.path.join(self._dir, f"{self._data_name}.zip")
        have = os.path.getsize(zip_path) if os.path.exists(zip_path) else 0
        req = urllib.request.Request(url)
        if have:
            req.add_header("Range", f"bytes={have}-")
        try:
            resp = urllib.request.urlopen(req)
        except urllib.error.HTTPError as err:
            if err.code == 416:  # range past EOF: already fully downloaded
                logger.info("%s archive already downloaded", self._data_name)
                return zip_path
            raise
        partial = getattr(resp, "status", None) == 206
        mode = "ab" if (have and partial) else "wb"
        with resp, open(zip_path, mode) as fh:
            shutil.copyfileobj(resp, fh, chunk_size)
        return zip_path

    def _verify_checksum(self, zip_path: str) -> None:
        want = self._state.get("sha256")
        if not want:
            return
        digest = hashlib.sha256()
        with open(zip_path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                digest.update(chunk)
        got = digest.hexdigest()
        if got != str(want).lower():
            os.remove(zip_path)  # poisoned cache must not resume
            raise ValueError(
                f"{self._data_name} checksum mismatch: expected {want}, "
                f"got {got}; the partial/corrupt archive was removed — "
                "re-run get() to re-download",
            )

    def _sanitized_target(self, filename: str) -> str:
        """Where ``zipfile.extract`` will actually place ``filename``:
        it sanitizes archive names (drops drive prefixes, leading
        separators, and ``..`` segments), so a raw
        ``os.path.join(self._dir, filename)`` can point OUTSIDE the
        cache dir for a hostile entry — the skip/utime logic must
        consult the sanitized path, never the raw join."""
        assert self._dir is not None
        parts = [
            p
            for p in filename.replace("\\", "/").split("/")
            if p not in ("", ".", "..") and ":" not in p
        ]
        return os.path.join(self._dir, *parts) if parts else self._dir

    def _extract(self, zip_path: str, remove_zip: bool) -> None:
        assert self._dir is not None
        with zipfile.ZipFile(zip_path) as zf:
            for info in zf.infolist():
                target = self._sanitized_target(info.filename)
                if (
                    os.path.isfile(target)
                    and os.path.getsize(target) == info.file_size
                ):
                    continue
                # extract() returns the real (sanitized) path — trust
                # it over our prediction for the timestamp restore
                target = zf.extract(info, self._dir)
                if os.path.isfile(target):
                    ts = datetime(*info.date_time).timestamp()
                    os.utime(target, (ts, ts))
        if remove_zip:
            os.remove(zip_path)

    def _rearrange(self) -> None:
        """Flatten the listed subdirs into the dataset root
        (``rearrange_files: true`` entries — reference
        ``dataset.py:315-341``)."""
        assert self._dir is not None
        for subdir in self._state.get("subdirs", []):
            src = os.path.join(self._dir, subdir)
            if not os.path.isdir(src):
                raise FileNotFoundError(f"Subdirectory {subdir} not found.")
            for root, _, files in os.walk(src):
                for name in files:
                    shutil.move(
                        os.path.join(root, name),
                        os.path.join(self._dir, name),
                    )
            shutil.rmtree(src)
        self._state["subdirs"] = []

    def get(
        self,
        data_name: str,
        root_dir: str | None = None,
        use_existing: bool = True,
        remove_zip: bool = True,
    ) -> str:
        """Fetch ``data_name`` into the local cache and return its
        directory (also exposed as ``self.dir`` / ``self.subdirs`` for
        reference-API parity)."""
        self.data_name = data_name
        self._set_data_dir(root_dir, use_existing)
        recorded = self._state.get("files", [])
        present = self._file_list()
        if recorded and all(f in present for f in recorded):
            logger.info("%s data already present at %s", data_name, self._dir)
        else:
            zip_path = self._download(str(self._state["url"]))
            self._verify_checksum(zip_path)
            self._extract(zip_path, remove_zip)
            if self._state.get("rearrange_files", False):
                self._rearrange()
            self._state["files"] = self._file_list()
            paths = set(self._state.get("data_path", []))
            paths.add(self._dir)
            self._state["data_path"] = sorted(paths)
            self._record_state()
        self.subdirs = [
            os.path.join(str(self._dir), s)
            for s in self._state.get("subdirs", [])
        ]
        self.dir = self._dir
        return str(self._dir)

    def remove(self, data_name: str, instance: str = "all") -> None:
        """Delete fetched copies ("all" or one recorded path) and update
        the user registry (reference ``dataset.py:386-419``)."""
        self.data_name = data_name
        existing = self.existing_data_paths
        if not existing:
            logger.info("%s data is not present", data_name)
            return
        if instance == "all":
            doomed = list(existing)
        elif instance in existing:
            doomed = [instance]
        else:
            logger.info("%s is not a recorded %s path", instance, data_name)
            return
        for path in doomed:
            if os.path.exists(path):
                shutil.rmtree(path)
            existing.remove(path)
        self._state["data_path"] = existing
        self._record_state()


#: module-level singleton, mirroring ``from sed.dataset import dataset``
dataset = Dataset()
