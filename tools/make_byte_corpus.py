#!/usr/bin/env python
"""Build a byte-level token corpus (.bin, uint16, vocab 256) from a tree
of text files — the zero-egress stand-in for the reference's OpenWebText
tokenized cache (training/README.md:205: the reference trains on OWT/Pile
tokenized to a flat mmap .bin; this rig has no network, so the real-data
L6 demonstration uses a real CODE corpus: the reference repo itself,
byte-level).

    python tools/make_byte_corpus.py /root/reference /tmp/ref_bytes.bin
"""

import os
import sys

import numpy as np

EXTS = {".py", ".cpp", ".cu", ".h", ".hpp", ".md", ".txt", ".cuh", ".rst",
        ".yaml", ".yml", ".json", ".sh", ".cfg", ".toml"}


def main(root, out_path, val_frac=0.01):
    blobs = []
    n_files = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if os.path.splitext(f)[1] not in EXTS:
                continue
            p = os.path.join(dirpath, f)
            try:
                with open(p, "rb") as fh:
                    blobs.append(fh.read())
                    blobs.append(b"\x00")  # document separator
                    n_files += 1
            except OSError:
                pass
    data = np.frombuffer(b"".join(blobs), np.uint8).astype(np.uint16)
    n_val = max(1, int(len(data) * val_frac))
    train, val = data[:-n_val], data[-n_val:]
    train.tofile(out_path)
    val.tofile(out_path + ".val")
    print(f"{n_files} files -> {len(train)} train tokens, "
          f"{len(val)} val tokens ({out_path})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
