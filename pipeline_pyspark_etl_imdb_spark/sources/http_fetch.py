"""HTTP ingest utility: streamed download with skip-if-exists.

Capability parity with ``download_imdb`` (/root/reference/src/etl_imdb.py:
97-118): 1 MiB streamed chunks, skip when the target exists unless
``overwrite``, and fail fast on non-2xx responses. Plain Python — ingest
to the landing zone happens outside Spark, exactly as in the reference.

``requests`` may be absent in some environments, so the import is gated;
callers get a clear ImportError only when they actually invoke a download.
"""

from __future__ import annotations

import pathlib

CHUNK_BYTES = 1024 * 1024

IMDB_DATASET_URLS = {
    "title.basics.tsv.gz": "https://datasets.imdbws.com/title.basics.tsv.gz",
    "title.ratings.tsv.gz": "https://datasets.imdbws.com/title.ratings.tsv.gz",
}


def download_file(url: str, dest: str | pathlib.Path, *, overwrite: bool = False) -> pathlib.Path:
    """Stream ``url`` to ``dest``; skip when present unless ``overwrite``."""
    dest = pathlib.Path(dest)
    if dest.exists() and not overwrite:
        return dest
    try:
        import requests
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "the optional 'requests' dependency is required for HTTP ingest"
        ) from exc
    dest.parent.mkdir(parents=True, exist_ok=True)
    with requests.get(url, stream=True, timeout=60) as resp:
        resp.raise_for_status()
        tmp = dest.with_suffix(dest.suffix + ".part")
        with open(tmp, "wb") as fh:
            for chunk in resp.iter_content(chunk_size=CHUNK_BYTES):
                fh.write(chunk)
        tmp.rename(dest)
    return dest


def download_imdb(raw_dir: str | pathlib.Path, *, overwrite: bool = False) -> list[pathlib.Path]:
    """Fetch the two IMDb dumps into the raw zone."""
    raw = pathlib.Path(raw_dir)
    return [
        download_file(url, raw / name, overwrite=overwrite)
        for name, url in IMDB_DATASET_URLS.items()
    ]


def ensure_files_exist(paths: list[str | pathlib.Path]) -> None:
    """Pre-flight check listing ALL missing inputs in one error
    (reference :90-94)."""
    missing = [str(p) for p in paths if not pathlib.Path(p).exists()]
    if missing:
        raise FileNotFoundError(f"missing input files: {', '.join(missing)}")
