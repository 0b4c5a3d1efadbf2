#!/usr/bin/env python3
"""Repo scan fingerprint: file count + tree hash over the scannable surface.

LEAKCHECK.json carries only a round number, so a re-scan is
indistinguishable from a round-number bump. This emits FINGERPRINT.json
with the commit, the number of files the scan surface contains, and a
deterministic sha256 over (path, content) of every tracked file under
src/, tools/, and build.sbt — the same surface the leak scan reads. A
LEAKCHECK round whose fingerprint matches FINGERPRINT.json provably
scanned THIS tree.

Usage: python3 tools/fingerprint.py [round]
"""
import hashlib, json, os, subprocess, sys

def main(round_no):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = subprocess.run(
        ["git", "-C", root, "ls-files", "--", "src", "tools", "build.sbt"],
        capture_output=True, text=True, check=True).stdout.split()
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        with open(os.path.join(root, f), "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    commit = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                            capture_output=True, text=True, check=True).stdout.strip()
    out = {"round": round_no, "commit": commit, "n_files": len(files),
           "tree_sha256": h.hexdigest()}
    with open(os.path.join(root, "FINGERPRINT.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))

if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
