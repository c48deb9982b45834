"""Dump acquisition (SURVEY.md S1/S4/S7).

The reference downloads the dump URL to a temp file on the driver
(``/root/reference/dbfy.py:84-97``), short-circuiting ``file://`` to a local
path, and removes it afterwards (``dbfy.py:100-102``). That stays a
driver-side pre-stage here too — a remote HTTP URL is not a distributed-
readable source; stage it once (ideally to object storage), then let Spark's
splittable readers fan out over it.

The reference's ``check_url`` (``dbfy.py:71-81``) is a latent no-op — its
``finally: return True`` swallows the real result and the call site is
commented out (``dbfy.py:274-276``) — so validation here is a real check,
not a port of the bug.
"""

from __future__ import annotations

import os
import tempfile
import urllib.parse
import urllib.request


def check_dump_url(url: str) -> bool:
    """True if the URL plausibly points at a wiki dump (what S4 *intended*:
    an http(s)/file URL ending in .xml or .xml.bz2)."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme not in ("http", "https", "file", ""):
        return False
    return parsed.path.endswith((".xml", ".xml.bz2", ".bz2"))


def download_dump(src: str) -> tuple[str, bool]:
    """Stage a dump for Spark to read. Returns (local_path, should_remove).

    ``file://`` URLs and bare paths short-circuit to the local path with no
    copy (and are never deleted), exactly like ``dbfy.py:88-91``.
    """
    parsed = urllib.parse.urlparse(src)
    if parsed.scheme in ("", "file"):
        # unquote: file:// URLs carry percent-encoded characters (%20 etc.)
        # which the filesystem does not — the verbatim path would miss an
        # existing file
        path = (
            urllib.parse.unquote(parsed.path)
            if parsed.scheme == "file"
            else src
        )
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return path, False
    fd, path = tempfile.mkstemp(suffix=os.path.basename(parsed.path) or ".dump")
    os.close(fd)
    try:
        urllib.request.urlretrieve(src, path)  # noqa: S310 — staging by design
    except BaseException:
        # a failed fetch must not leak its (possibly multi-GB partial)
        # temp file on every retry
        os.remove(path)
        raise
    return path, True


def cleanup_dump(path: str, should_remove: bool) -> None:
    """Remove a staged dump unless it was a local file (``dbfy.py:100-102``)."""
    if should_remove and os.path.exists(path):
        os.remove(path)
