"""Interactive nearest-neighbor console (reference
search/console/console.go): load a text model file, type a word, get top-k
cosine neighbors.

    python -m goctr_tpu.embedding.console model.txt [k]
"""
from __future__ import annotations

import sys

from goctr_tpu.embedding.search import Searcher
from goctr_tpu.embedding.store import load_embedding_map


def repl(model_path: str, k: int = 10) -> None:
    emb = load_embedding_map(model_path)
    searcher = Searcher(emb)
    print(f"loaded {len(emb)} x {emb.dim} embeddings; "
          f"type a word (empty line to quit)")
    while True:
        try:
            word = input(">> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not word:
            break
        results = searcher.search(word, k=k)
        if not results:
            print(f"  {word!r} not in vocabulary")
            continue
        width = max(len(w) for w, _ in results)
        print(f"  {'RANK':<5} {'WORD':<{width}}  SIMILARITY")
        for rank, (w, sim) in enumerate(results, 1):
            print(f"  {rank:<5} {w:<{width}}  {sim:.6f}")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    repl(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    return 0


if __name__ == "__main__":
    sys.exit(main())
