"""Index snapshot / restore — the Lucene/Elasticsearch snapshot API
shape: a snapshot is a byte-exact, digest-verified copy of the index
tree plus a snapshot manifest; restore verifies every file digest
before the index is considered live, so a torn copy can never serve.

The reference has no index at all (it recomputes per call); this is
engine-lifecycle surface in the spirit of its golden-file methodology
(``samples/python/generate_reference_embeddings.py``): artifacts are
files, and correctness of a copy is provable by content digest.

Scale note: snapshots copy FILES, never decode postings — a 10^12-doc
index snapshots at storage bandwidth. At 100 TB you'd point ``dest``
at an object-store prefix and fan the per-file copies out as Ray tasks
over the (embarrassingly parallel) file list; here the file list is
small and a sequential copy with digests is the honest baseline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


SNAPSHOT_MANIFEST = "_snapshot.json"


def _file_digest(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f == SNAPSHOT_MANIFEST:
                continue
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def snapshot_index(index_dir: str, dest: str) -> dict:
    """Copy the index tree to ``dest`` and write a snapshot manifest
    (relative path -> sha256, size) into the destination. Refuses a
    non-empty ``dest`` (snapshots are immutable; take a new one).
    Returns the manifest dict."""
    if os.path.exists(dest) and os.listdir(dest):
        raise ValueError(f"snapshot destination {dest!r} is not empty")
    os.makedirs(dest, exist_ok=True)
    files = {}
    for rel in _walk_files(index_dir):
        src = os.path.join(index_dir, rel)
        dst = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        files[rel] = {"sha256": _file_digest(dst),
                      "size": os.path.getsize(dst)}
        # verify against the SOURCE digest: a copy torn by a concurrent
        # writer fails here, not at restore time
        if files[rel]["sha256"] != _file_digest(src):
            raise RuntimeError(f"torn copy detected for {rel!r}")
    manifest = {"n_files": len(files), "files": files}
    with open(os.path.join(dest, SNAPSHOT_MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def verify_snapshot(snap_dir: str) -> dict:
    """Check every file in the snapshot against its recorded digest.
    Raises on any mismatch / missing / extra file; returns the
    manifest."""
    with open(os.path.join(snap_dir, SNAPSHOT_MANIFEST)) as f:
        manifest = json.load(f)
    have = set(_walk_files(snap_dir))
    want = set(manifest["files"])
    if have != want:
        raise RuntimeError(
            f"snapshot file set mismatch: missing={sorted(want - have)} "
            f"extra={sorted(have - want)}")
    for rel, meta in manifest["files"].items():
        got = _file_digest(os.path.join(snap_dir, rel))
        if got != meta["sha256"]:
            raise RuntimeError(f"digest mismatch for {rel!r}")
    return manifest


def restore_index(snap_dir: str, index_dir: str) -> str:
    """Verify the snapshot, then materialize it at ``index_dir`` (which
    must not already contain an index). The restored tree is the
    snapshot minus the snapshot manifest — i.e. exactly the original
    index files, so every search result is byte-identical to the
    source index's."""
    verify_snapshot(snap_dir)
    if os.path.exists(index_dir) and os.listdir(index_dir):
        raise ValueError(f"restore target {index_dir!r} is not empty")
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(snap_dir, SNAPSHOT_MANIFEST)) as f:
        manifest = json.load(f)
    for rel, meta in manifest["files"].items():
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        if _file_digest(dst) != meta["sha256"]:
            raise RuntimeError(f"restore digest mismatch for {rel!r}")
    return index_dir
