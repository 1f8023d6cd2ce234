"""SciCat metadata retriever (reference
``src/sed/loader/flash/metadata.py:1-146``).

Driver-side convenience for FEL beamtimes: given a SciCat archiver URL,
a bearer token, a beamtime id and run numbers, fetch each run's dataset
record and fold it into the acquisition-metadata dict that rides along
to :func:`sed_spark.nexus.to_nexus`.

Differences from the reference (deliberate): stdlib ``urllib`` instead
of ``requests``, and the HTTP transport is injectable (``opener``) so
the full URL-construction / fallback / error path is unit-testable
offline — the real service is an external instance this runtime cannot
reach.
"""

from __future__ import annotations

import json
import logging
import urllib.error
import urllib.request
from typing import Any, Callable

from sed_spark.config import read_env_var, save_env_var

logger = logging.getLogger("sed_spark.scicat")

#: transport signature: (url, headers, timeout) -> response BODY bytes;
#: raise urllib.error.URLError (or subclass) on failure
Opener = Callable[[str, dict, float], bytes]


def _default_opener(url: str, headers: dict, timeout: float) -> bytes:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


class MetadataRetriever:
    """Fetch per-run dataset metadata from a SciCat instance.

    Args:
        metadata_config: dict carrying at least ``archiver_url``.
        token: bearer token; when given it is persisted via
            :func:`sed_spark.config.save_env_var` under ``SCICAT_TOKEN``
            (reference behavior), otherwise it is resolved from the
            environment / user ``.env`` store.
        opener: injectable transport for tests; defaults to urllib.
    """

    def __init__(
        self,
        metadata_config: dict,
        token: str | None = None,
        opener: Opener | None = None,
    ) -> None:
        if token:
            self.token = token
            save_env_var("SCICAT_TOKEN", token)
        else:
            self.token = read_env_var("SCICAT_TOKEN")
        if not self.token:
            raise ValueError(
                "Token is required for metadata collection. Either provide "
                "a token parameter or set the SCICAT_TOKEN environment "
                "variable.",
            )
        self.url = metadata_config.get("archiver_url")
        if not self.url:
            raise ValueError(
                "No URL provided for fetching metadata from scicat.",
            )
        self.headers = {
            "Content-Type": "application/json",
            "Accept": "application/json",
        }
        self._opener = opener or _default_opener

    def get_metadata(
        self,
        beamtime_id: str,
        runs: list,
        metadata: dict | None = None,
    ) -> dict:
        """Merged metadata for ``beamtime_id`` across ``runs`` — each
        run's record is fetched independently and update()d into the
        (optionally pre-seeded) dict; a failed run contributes nothing
        rather than failing the whole collection (reference
        ``metadata.py:53-87``)."""
        metadata = {} if metadata is None else metadata
        for run in runs:
            pid = f"{beamtime_id}/{run}"
            metadata.update(self._get_metadata_per_run(pid))
        return metadata

    def _get_metadata_per_run(self, pid: str) -> dict[str, Any]:
        """One run's record: try the new-format dataset URL first; an
        EMPTY body means an older SciCat, so retry the legacy
        ``%2F``-prefixed form. Transport errors warn and yield ``{}``."""
        headers = dict(self.headers)
        headers["Authorization"] = f"Bearer {self.token}"
        try:
            body = self._opener(self._new_dataset_url(pid), headers, 10.0)
            if not body:
                body = self._opener(self._old_dataset_url(pid), headers, 10.0)
            return json.loads(body) if body else {}
        except (urllib.error.URLError, TimeoutError, json.JSONDecodeError) as exc:
            logger.warning(
                "Failed to retrieve metadata for PID %s: %s", pid, exc,
            )
            return {}

    def _old_dataset_url(self, pid: str) -> str:
        return f"{self.url}/Datasets/%2F{self._reformat_pid(pid)}"

    def _new_dataset_url(self, pid: str) -> str:
        return f"{self.url}/Datasets/{self._reformat_pid(pid)}"

    @staticmethod
    def _reformat_pid(pid: str) -> str:
        """SciCat pids URL-encode the slash (facility prefix may be
        empty, e.g. DESY)."""
        return pid.replace("/", "%2F")
