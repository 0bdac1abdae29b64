"""SC10: remote ref resolution feeding paths to ``spark.read``.

The reference resolves source refs — ``git+https://host/org/repo@ref[/path]``
with optional ``#subdirectory=``, http(s) URLs, fsspec paths, absolute local
paths — to local filesystem paths through a content-addressed cache
(amplifierd/services/ref_resolution.py:54-156 — read, not copied).

Engine shape, per SURVEY.md §2.1: the *fetch* is driver-side I/O that ends
in a path handed to ``spark.read``; the *parse/classify* step is pure and
vectorized so a column of a million refs is classified in one Catalyst pass
(a config table's ref column, a crawl frontier, …):

- :func:`parse_ref` — Catalyst-only struct column: (kind, base_url,
  ref_name, asset_path, subdirectory, error). No UDF.
- :class:`RefResolver` — the driver-side fetch loop with injectable
  fetchers. The DEFAULTS are real: :func:`git_fetcher` shallow-clones the
  pinned ref with the git binary (tested against ``file://`` repos — the
  same code path as https/ssh remotes), :func:`http_fetcher` streams
  downloads with requests (tested against a localhost server), and
  :func:`fsspec_fetcher` works as soon as fsspec is installed (the one
  remaining declared stub in this container). Local-path resolution needs no
  fetcher. The cache key (sha256 of the repo@ref pinning) and layout match
  the reference's ``cache/git/{commit}`` idea — content-addressed so two
  sessions never re-fetch the same pin.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_GIT_RE = r"^git\+([^@]+)@([^/#]+)(?:/([^#]*))?(?:#subdirectory=(.+))?$"


class RefResolutionError(Exception):
    """A source ref could not be resolved to a local path."""


def parse_ref(col: Column | str) -> Column:
    """Classify + parse a ref column in one vectorized pass.

    Returns a struct: kind ∈ ('git', 'http', 'fsspec', 'local', 'invalid'),
    base_url, ref_name, asset_path, subdirectory, error. Precedence mirrors
    the reference's resolve_ref branch order (ref_resolution.py:89-156):
    git+ → absolute path → http(s) → fsspec; a git+ ref missing its @ref is
    invalid with the reference's message shape.
    """
    c = F.col(col) if isinstance(col, str) else col
    is_git = c.startswith("git+")
    git_ok = c.rlike(_GIT_RE)
    base = F.regexp_extract(c, _GIT_RE, 1)
    refn = F.regexp_extract(c, _GIT_RE, 2)
    apath = F.regexp_extract(c, _GIT_RE, 3)
    subdir = F.regexp_extract(c, _GIT_RE, 4)
    nul = F.lit(None).cast("string")
    kind = (
        F.when(is_git & git_ok, F.lit("git"))
        .when(is_git, F.lit("invalid"))
        .when(c.startswith("/"), F.lit("local"))
        .when(c.startswith("http://") | c.startswith("https://"), F.lit("http"))
        .otherwise(F.lit("fsspec"))
    )
    return F.struct(
        kind.alias("kind"),
        F.when(kind == "git", base).otherwise(nul).alias("base_url"),
        F.when(kind == "git", refn).otherwise(nul).alias("ref_name"),
        F.when(kind == "git", F.nullif(apath, F.lit("")))
        .otherwise(nul)
        .alias("asset_path"),
        F.when(kind == "git", F.nullif(subdir, F.lit("")))
        .otherwise(nul)
        .alias("subdirectory"),
        F.when(
            kind == "invalid",
            F.concat(F.lit("Invalid git ref format (missing @ref): "), c),
        )
        .otherwise(nul)
        .alias("error"),
    )


def cache_key(base_url: str, ref_name: str) -> str:
    """Content-addressed cache key for a repo@ref pin. The reference keys by
    resolved commit hash; without network we pin on the (url, ref) pair —
    same collision-free property for immutable refs (tags/commits), and the
    fetcher may re-key by commit once it has talked to the remote."""
    return hashlib.sha256(f"{base_url}@{ref_name}".encode()).hexdigest()[:24]


def _unavailable(kind: str) -> Callable[..., str]:
    def fetch(*a, **k):
        raise NotImplementedError(
            f"no {kind} fetcher in this environment. Production: inject a "
            f"fetcher that materializes the ref into cache_dir and returns "
            f"the local path (git: shallow clone+checkout; http: streamed "
            f"download; fsspec: fs.get)."
        )

    return fetch


def git_fetcher(base_url: str, ref_name: str, dest_dir: str) -> str:
    """Real git fetcher (ref_resolution.py:54-101 semantics — read, not
    copied): shallow-clone the pinned ref. Branches/tags take the fast
    ``--depth 1 --branch`` path; commit pins fall back to a full clone +
    detached checkout (git cannot shallow-clone an arbitrary sha without
    server support). Works for every transport git itself supports —
    https/ssh on a networked deploy, ``file://``/local paths in the tests."""
    import shutil
    import subprocess

    def run(*cmd: str) -> None:
        subprocess.run(list(cmd), check=True, capture_output=True, text=True)

    try:
        run("git", "clone", "--depth", "1", "--branch", ref_name,
            base_url, dest_dir)
    except subprocess.CalledProcessError:
        shutil.rmtree(dest_dir, ignore_errors=True)  # partial clone remains
        run("git", "clone", base_url, dest_dir)
        run("git", "-C", dest_dir, "checkout", "--detach", ref_name)
    return dest_dir


def http_fetcher(url: str, dest_dir: str) -> str:
    """Real http(s) fetcher: streamed download into the cache slot (the
    reference's httpx.stream → tmp → rename; requests here). 1 MiB chunks —
    memory-bounded for arbitrarily large assets."""
    import requests

    os.makedirs(dest_dir, exist_ok=True)
    name = os.path.basename(url.split("?", 1)[0].rstrip("/")) or "download"
    out = os.path.join(dest_dir, name)
    tmp = out + ".part"
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(1 << 20):
                f.write(chunk)
    os.replace(tmp, out)  # cache slot only ever holds complete files
    return out


def fsspec_fetcher(url: str, dest_dir: str) -> str:
    """fsspec fetcher: real when fsspec is importable (s3/gcs/abfs/... on a
    real deploy), NotImplementedError here (module not in this container)."""
    try:
        import fsspec
    except ImportError as e:
        raise NotImplementedError(
            "fsspec not installed in this environment; install fsspec (+ the "
            "protocol's package) and this fetcher works unchanged"
        ) from e
    fs, path = fsspec.core.url_to_fs(url)
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, os.path.basename(path.rstrip("/")) or "asset")
    fs.get(path, out, recursive=fs.isdir(path))
    return out


class RefResolver:
    """Driver-side resolution: parsed ref → local path, through a cache.

    ``fetchers`` maps kind → callable. git fetchers receive
    (base_url, ref_name, dest_dir) and must populate dest_dir; http/fsspec
    fetchers receive (url, dest_dir) and return the file path they wrote.
    Local refs resolve without any fetcher (existence-checked, like the
    reference's absolute-path branch).
    """

    def __init__(
        self,
        cache_dir: str,
        fetchers: dict[str, Callable] | None = None,
    ):
        self.cache_dir = cache_dir
        os.makedirs(os.path.join(cache_dir, "git"), exist_ok=True)
        os.makedirs(os.path.join(cache_dir, "fsspec"), exist_ok=True)
        # Real fetchers by default (git binary + requests are present; the
        # tests exercise git via file:// clones and http via a localhost
        # server — no external network needed). fsspec degrades to
        # NotImplementedError until the module is installed.
        self.fetchers = {
            "git": git_fetcher,
            "http": http_fetcher,
            "fsspec": fsspec_fetcher,
            **(fetchers or {}),
        }

    def resolve(self, parsed, source_ref: str) -> str:
        """parsed = a Row/dict from :func:`parse_ref`. Returns a local path;
        raises :class:`RefResolutionError` on invalid refs, missing assets,
        or failed fetches (the reference's error contract)."""
        kind = parsed["kind"]
        if kind == "invalid":
            raise RefResolutionError(parsed["error"])
        if kind == "local":
            if not os.path.exists(source_ref):
                raise RefResolutionError(
                    f"Absolute path does not exist: {source_ref}"
                )
            return source_ref
        try:
            if kind == "git":
                key = cache_key(parsed["base_url"], parsed["ref_name"])
                dest = os.path.join(self.cache_dir, "git", key)
                if not os.path.exists(dest):
                    self.fetchers["git"](
                        parsed["base_url"], parsed["ref_name"], dest
                    )
                root = (
                    os.path.join(dest, parsed["subdirectory"])
                    if parsed["subdirectory"]
                    else dest
                )
                resolved = (
                    os.path.join(root, parsed["asset_path"])
                    if parsed["asset_path"]
                    else root
                )
                if not os.path.exists(resolved):
                    raise RefResolutionError(
                        f"Asset not found at resolved path: {resolved}\n"
                        f"Original ref: {source_ref}"
                    )
                return resolved
            # http / fsspec: one cached file per url hash
            key = hashlib.sha256(source_ref.encode()).hexdigest()[:24]
            dest = os.path.join(self.cache_dir, "fsspec", key)
            if not os.path.exists(dest):
                os.makedirs(dest, exist_ok=True)
                return self.fetchers[kind](source_ref, dest)
            files = sorted(os.listdir(dest))
            if not files:
                return self.fetchers[kind](source_ref, dest)
            return os.path.join(dest, files[0])
        except RefResolutionError:
            raise
        except NotImplementedError:
            raise
        except Exception as e:  # the reference wraps every failure uniformly
            raise RefResolutionError(
                f"Failed to resolve reference {source_ref}: {e}"
            ) from e
