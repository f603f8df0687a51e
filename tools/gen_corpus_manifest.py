"""Regenerate BENCH/corpus_manifest.json — the pinned content hash of the
4,096-doc extraction bench corpus.

Run ONLY on an intended recipe change, and record old/new docs/s both ways
once in BENCH/BASELINE.md (the manifest is what makes extract_docs_per_sec
byte-comparable round-over-round; see bench.py)."""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    import shutil

    from bench import corpus_fingerprint
    from caraspark.bench_extract import corpus_path, ensure_corpus
    from caraspark.session import get_spark

    spark = get_spark("gen-corpus-manifest")
    path = corpus_path(4096)
    # force a clean rebuild so the manifest never pins a stale /tmp corpus
    shutil.rmtree(path, ignore_errors=True)
    n = ensure_corpus(spark, 4096)
    sha = corpus_fingerprint(spark, path)
    out = {"n_docs": n, "corpus_md5": sha}
    dest = os.path.join(HERE, "BENCH", "corpus_manifest.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
