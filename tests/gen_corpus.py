"""Materialize the embedded conformance corpus into tests/corpus/.

Run:  python tests/gen_corpus.py
Writes NNN-name.html / NNN-name.nt / NNN-name.json per fixture.
The .nt goldens come straight from fixture_defs.py (hand-derived).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from fixture_defs import BASE, FIXTURES  # noqa: E402

CORPUS = pathlib.Path(__file__).parent / "corpus"


def main():
    CORPUS.mkdir(exist_ok=True)
    for name, markup, nt, meta in FIXTURES:
        (CORPUS / f"{name}.html").write_text(markup)
        (CORPUS / f"{name}.nt").write_text(nt + "\n" if nt else "")
        meta_out = {"base": meta.get("base", BASE)}
        for k in ("expect_diags", "options", "vocab_graphs", "mode"):
            if k in meta:
                meta_out[k] = meta[k]
        (CORPUS / f"{name}.json").write_text(json.dumps(meta_out, indent=1))
    print(f"wrote {len(FIXTURES)} fixtures to {CORPUS}")


if __name__ == "__main__":
    main()
