"""Resource downloader with lifetime-based local cache (S2).

Spark-first re-expression of the reference downloader
(``biocypher/_get.py:27-491``): ``Resource`` / ``FileDownload`` /
``APIRequest`` descriptors and a ``Downloader`` that keeps a JSON record
(``cache.json``) of each resource's download date and re-fetches only when
the per-resource ``lifetime`` (days) has elapsed; ``lifetime=0`` caches
forever.

Differences from the reference, driven by this environment:

- Transport is INJECTABLE. The sandbox has no network, and the reference's
  transport stack (``pooch``/``requests``) is not installed, so ``Downloader``
  takes ``fetcher(url, dest_path)`` and ``dir_lister(url) -> [names]``
  callables. The defaults use only the stdlib (``urllib.request``, ``ftplib``)
  and are exercised in tests through injected local-filesystem fakes.
- Archive expansion uses the stdlib instead of pooch processors: ``.zip`` /
  ``.tar.gz`` / ``.tgz`` members are extracted into ``<fname>.unzip`` /
  ``<fname>.untar`` directories and the member paths are returned; a bare
  ``.gz`` is decompressed next to the download — mirroring
  ``pooch.Unzip/Untar/Decompress`` (reference ``_get.py:305-368``).

This is driver-side utility code by design (reference parity); the fetched
files are inputs for ``spark.read`` downstream, the downloads themselves are
not distributed work.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import shutil
import tarfile
import zipfile
from datetime import datetime, timedelta
from tempfile import mkdtemp
from typing import Callable, Optional, Union

Urls = Union[str, list]


class Resource:
    """A named, cacheable download: one URL or a list of URLs.

    ``lifetime`` is the cache validity in days; 0 = never expires.
    Mirrors reference ``_get.py:27-54``.
    """

    def __init__(self, name: str, url_s: Urls, lifetime: int = 0):
        self.name = name
        self.url_s = url_s
        self.lifetime = lifetime


class FileDownload(Resource):
    """A file (or FTP directory when ``is_dir``) download. Ref ``_get.py:56-82``."""

    def __init__(self, name: str, url_s: Urls, lifetime: int = 0, is_dir: bool = False):
        super().__init__(name, url_s, lifetime)
        self.is_dir = is_dir


class APIRequest(Resource):
    """A JSON API request cached as ``<fname>.json``. Ref ``_get.py:84-101``."""


def _default_fetcher(url: str, dest: str) -> None:
    """Stdlib HTTP(S)/FTP fetch. Only used when no fetcher is injected."""
    from urllib.request import urlopen

    with urlopen(url) as resp, open(dest, "wb") as f:  # noqa: S310 (caller-supplied URL)
        shutil.copyfileobj(resp, f)


def _default_dir_lister(url: str) -> list:
    """List an FTP directory (the only scheme the reference supports either;
    ``_get.py:370-400``)."""
    if not url.startswith("ftp://"):
        raise NotImplementedError("Only FTP directories are supported at the moment.")
    import ftplib

    hostpath = url[len("ftp://") :]
    host, _, directory = hostpath.partition("/")
    ftp = ftplib.FTP(host)
    try:
        ftp.login()
        ftp.cwd(directory)
        return ftp.nlst()
    finally:
        ftp.quit()


class Downloader:
    """Lifetime-cached resource downloads with a JSON cache record.

    Reference parity (``_get.py:103-457``): same cache layout
    (``<cache_dir>/<resource.name>/...`` + ``cache.json`` with
    ``{url, date_downloaded, lifetime}`` per resource), same expiry rule,
    same filename trimming, same return contract (flat list of paths).
    """

    def __init__(
        self,
        cache_dir: Optional[str] = None,
        fetcher: Optional[Callable[[str, str], None]] = None,
        dir_lister: Optional[Callable[[str], list]] = None,
    ):
        self.cache_dir = cache_dir or mkdtemp(prefix="biocypher_spark_cache_")
        self.cache_file = os.path.join(self.cache_dir, "cache.json")
        self._fetch = fetcher or _default_fetcher
        self._list_dir = dir_lister or _default_dir_lister
        self.cache_dict = self._load_cache_dict()

    # -- public API ---------------------------------------------------------

    def download(self, *resources: Resource) -> list:
        """Download (or serve from cache) each resource; flat list of paths."""
        paths: list = []
        for resource in resources:
            got = self._download_or_cache(resource)
            paths.extend(got if isinstance(got, list) else [got])
        return paths

    def get_cached_version(self, resource: Resource) -> list:
        """Paths currently cached for ``resource`` (recursive: archive
        expansion nests member files in processor subdirectories)."""
        root = os.path.join(self.cache_dir, resource.name)
        out = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in sorted(filenames):
                out.append(os.path.join(dirpath, fn))
        return out

    # -- cache bookkeeping ----------------------------------------------------

    def _load_cache_dict(self) -> dict:
        os.makedirs(self.cache_dir, exist_ok=True)
        if not os.path.exists(self.cache_file):
            with open(self.cache_file, "w") as f:
                json.dump({}, f)
        with open(self.cache_file) as f:
            return json.load(f)

    def _is_cache_expired(self, resource: Resource) -> bool:
        record = self.cache_dict.get(resource.name)
        if not record:
            return True
        if resource.lifetime == 0:
            return False
        stamp = record["date_downloaded"]
        try:
            downloaded = datetime.strptime(stamp, "%Y-%m-%d %H:%M:%S.%f")
        except ValueError:
            # str(datetime) omits ".%f" when microsecond == 0 (a 1-in-10^6
            # record); the reference crashes on such records (_get.py:193),
            # here the no-fraction format is accepted
            downloaded = datetime.strptime(stamp, "%Y-%m-%d %H:%M:%S")
        return downloaded + timedelta(days=resource.lifetime) < datetime.now()

    def _update_cache_record(self, resource: Resource) -> None:
        urls = resource.url_s if isinstance(resource.url_s, list) else [resource.url_s]
        self.cache_dict[resource.name] = {
            "url": urls,
            "date_downloaded": str(datetime.now()),
            "lifetime": resource.lifetime,
        }
        with open(self.cache_file, "w") as f:
            json.dump(self.cache_dict, f, default=str)

    def _delete_expired_cache(self, resource: Resource) -> None:
        path = os.path.join(self.cache_dir, resource.name)
        if os.path.isdir(path):
            shutil.rmtree(path)

    # -- download paths ---------------------------------------------------------

    def _download_or_cache(self, resource: Resource, cache: bool = True):
        if self._is_cache_expired(resource) or not cache:
            self._delete_expired_cache(resource)
            if isinstance(resource, APIRequest):
                paths = self._download_api_request(resource)
            elif isinstance(resource, FileDownload):
                paths = self._download_files(resource, cache)
            else:
                raise TypeError(f"Unknown resource type: {type(resource)}")
        else:
            paths = self.get_cached_version(resource)
        self._update_cache_record(resource)
        return paths

    def _download_files(self, fd: FileDownload, cache: bool) -> list:
        if fd.is_dir:
            # expand the directory listing into per-file URLs, then recurse
            names = self._list_dir(fd.url_s)
            fd.url_s = [f"{fd.url_s}/{name}" for name in names]
            fd.is_dir = False
            return self._download_or_cache(fd, cache)
        urls = fd.url_s if isinstance(fd.url_s, list) else [fd.url_s]
        dest_dir = os.path.join(self.cache_dir, fd.name)
        paths: list = []
        for url in urls:
            paths.extend(self._retrieve(url, self._trim_filename(url), dest_dir))
        return paths

    def _download_api_request(self, api: APIRequest) -> list:
        urls = api.url_s if isinstance(api.url_s, list) else [api.url_s]
        paths = []
        for url in urls:
            fname = self._trim_filename(url)
            dest = os.path.join(self.cache_dir, api.name, f"{fname}.json")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = dest + ".part"
            self._fetch(url, tmp)
            # validate + normalize: the cache stores the parsed JSON payload
            # (reference caches response.json(); _get.py:254-284)
            with open(tmp) as f:
                payload = json.load(f)
            with open(dest, "w") as f:
                json.dump(payload, f)
            os.remove(tmp)
            paths.append(dest)
        return paths

    def _retrieve(self, url: str, fname: str, dest_dir: str) -> list:
        """Fetch one URL into ``dest_dir`` and expand archives (stdlib
        equivalents of the pooch processors; ref ``_get.py:305-368``)."""
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, fname)
        self._fetch(url, dest)
        if fname.endswith(".zip"):
            out_dir = dest + ".unzip"
            os.makedirs(out_dir, exist_ok=True)
            with zipfile.ZipFile(dest) as zf:
                zf.extractall(out_dir)
                members = [os.path.join(out_dir, n) for n in zf.namelist() if not n.endswith("/")]
            return members
        if fname.endswith((".tar.gz", ".tgz", ".tar")):
            out_dir = dest + ".untar"
            os.makedirs(out_dir, exist_ok=True)
            with tarfile.open(dest) as tf:
                tf.extractall(out_dir, filter="data")
                members = [os.path.join(out_dir, m.name) for m in tf.getmembers() if m.isfile()]
            return members
        if fname.endswith(".gz"):
            out = dest[: -len(".gz")]
            with gzip.open(dest, "rb") as src, open(out, "wb") as dst:
                shutil.copyfileobj(src, dst)
            return [out]
        return [dest]

    @staticmethod
    def _trim_filename(url: str, max_length: int = 150) -> str:
        """URL -> cache filename; query params sanitised, long names hashed
        (same rules as reference ``_get.py:459-491`` so cache layouts match)."""
        fname = url[url.rfind("/") + 1 :]
        for ch in '?&=:*|<>"\\()[]{}; ':
            fname = fname.replace(ch, "_")
        if len(fname) > max_length:
            fname = hashlib.md5(url.encode()).hexdigest()
        return fname
