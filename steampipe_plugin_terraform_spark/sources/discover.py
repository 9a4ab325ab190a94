"""Driver-side file discovery: glob lists → concrete (path, kind) rows.

Behavior port of ``tfConfigList`` (/root/reference/terraform/utils.go:38-169):

- three independent glob lists route files to kinds config/plan/state
- ``*`` and ``**`` globs and ``~`` expansion (SDK GetSourceFiles semantics,
  docs/index.md:118-268)
- directories are skipped (utils.go:96-103)
- a missing/unmatchable path contributes zero rows instead of failing
  (utils.go:87-90)
- a ``path =`` equals-qual bypasses globbing entirely and routes a
  ``.tfstate`` suffix to the state branch (utils.go:45-58) — see
  ``discover_files(path_qual=...)``

Remote sources: ``s3a://``/``s3://`` URLs pass through untouched (Spark's
Hadoop FS reads them natively — the scale path); git URLs are fetched to a
local temp dir on the driver (``fetch_remote``), mirroring the reference's
go-getter behavior (utils.go:82; docs/index.md:118-268) without putting a
non-distributable step on executors.
"""

from __future__ import annotations

import atexit
import glob as _glob
import os
import shutil
import re
import subprocess
import tempfile

_REMOTE_SCHEME_RE = re.compile(r"^(s3a?|wasbs?|abfss?|gs|hdfs)://")
_GIT_RE = re.compile(r"^(git::|github\.com/|gitlab\.com/|bitbucket\.org/|https://github\.com/|https://gitlab\.com/|https://bitbucket\.org/)")


def is_dfs_url(p: str) -> bool:
    return bool(_REMOTE_SCHEME_RE.match(p))


def is_git_url(p: str) -> bool:
    return bool(_GIT_RE.match(p))


def expand_glob(pattern: str) -> list[str]:
    """Expand one glob pattern to concrete files (dirs skipped, misses → [])."""
    if is_dfs_url(pattern):
        # distributed-FS URLs are resolved by Spark's reader (pathGlobFilter
        # handles trailing globs); pass through as-is
        return [pattern]
    if is_git_url(pattern):
        local, sub_glob = fetch_remote(pattern)
        return expand_glob(os.path.join(local, sub_glob or "**/*.tf"))
    pattern = os.path.expanduser(pattern)
    out = []
    for m in sorted(_glob.glob(pattern, recursive=True)):
        if os.path.isdir(m):
            continue
        out.append(os.path.abspath(m))
    return out


def fetch_remote(url: str) -> tuple[str, str | None]:
    """Clone a git URL (optionally ``?ref=`` pinned, ``//sub/glob`` suffixed)
    to a temp dir; returns (local_dir, sub_glob or None).

    Driver-side only — mirrors go-getter's git support (reference
    docs/index.md:141-200). Requires a ``git`` binary; raises RuntimeError
    when unavailable.
    """
    raw = url[len("git::"):] if url.startswith("git::") else url
    ref = None
    if "?ref=" in raw:
        raw, ref = raw.split("?ref=", 1)
    sub = None
    # go-getter: '//' after the host part separates repo from subdir glob
    m = re.match(r"^(?P<repo>(?:https://)?[^/]+/[^/]+/[^/]+)//(?P<sub>.+)$", raw)
    if m:
        raw, sub = m.group("repo"), m.group("sub")
    if "://" not in raw and not raw.startswith("git@"):
        raw = "https://" + raw
    dest = tempfile.mkdtemp(prefix="tf_git_")
    atexit.register(shutil.rmtree, dest, ignore_errors=True)
    try:
        cmd = ["git", "clone", "--depth", "1"]
        if ref:
            cmd += ["--branch", ref]
        cmd += [raw, dest]
        r = subprocess.run(cmd, capture_output=True, timeout=300)
        if r.returncode != 0 and ref:
            # a commit SHA is not clonable via --branch: full clone + checkout
            shutil.rmtree(dest, ignore_errors=True)
            subprocess.run(["git", "clone", raw, dest], check=True, capture_output=True, timeout=600)
            subprocess.run(["git", "-C", dest, "checkout", ref], check=True, capture_output=True, timeout=60)
        elif r.returncode != 0:
            raise subprocess.CalledProcessError(r.returncode, cmd, r.stdout, r.stderr)
    except (OSError, subprocess.SubprocessError) as e:
        raise RuntimeError(f"git fetch failed for {url}: {e}") from e
    return dest, sub


def discover_files(
    config_paths: list[str] | tuple = (),
    plan_paths: list[str] | tuple = (),
    state_paths: list[str] | tuple = (),
    path_qual: str | None = None,
) -> list[tuple[str, str]]:
    """Resolve the three glob lists to [(path, kind)] rows.

    ``path_qual`` replicates the pushed-down ``WHERE path = x`` fast path:
    exactly that file, state-routed iff it ends in ``.tfstate``.
    """
    if path_qual is not None:
        kind = "state" if path_qual.endswith(".tfstate") else "config"
        if not is_dfs_url(path_qual):
            # normalize like expand_glob does, so the reader's absolute URI
            # and the path column agree with the caller's filter value
            path_qual = os.path.abspath(os.path.expanduser(path_qual))
        return [(path_qual, kind)]
    out: list[tuple[str, str]] = []
    for patterns, kind in ((config_paths, "config"), (plan_paths, "plan"), (state_paths, "state")):
        for pattern in patterns or ():
            for path in expand_glob(pattern):
                out.append((path, kind))
    return out
