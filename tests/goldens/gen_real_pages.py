"""Golden generator for real-page extraction regression tests.

Runs the extraction pipeline over the reference repo's own sample
pages (atra/testdata/samples — the inputs of the reference's
extraction tests, extraction/extractor/mod.rs:173-214) and pins the
output: format, encoding, text md5/length, and the full link list.

These goldens break the fixture circularity of the synthetic corpus
(whose golden links are generated from the same canonicalize/extract
contract): real, malformed, half-megabyte HTML exercises html.parser
and urllib where they can diverge from html5ever/url::Url.

Regenerate (after an INTENTIONAL extraction change) with:
    python tests/goldens/gen_real_pages.py
then review the diff before committing.
"""

import hashlib
import json
import os

SAMPLES = "/root/reference/atra/testdata/samples"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "real_pages")
PAGE_URL = "https://www.example.com/"  # the reference test's base URL


def extract_one(name: str, raw: bytes) -> dict:
    from atra_spark.functions.extract import extract_pages_batch
    import pandas as pd

    pdf = pd.DataFrame({"url": [PAGE_URL + name], "html": [raw]})
    out = next(iter(extract_pages_batch(iter([pdf]), aggressive=False)))
    r = out.iloc[0]
    text = r["text"] if r["text"] is not None else ""
    return {
        "file": name,
        "page_url": PAGE_URL + name,
        "format": r["format"],
        "encoding": r["encoding"],
        "text_len": len(text),
        "text_md5": hashlib.md5(text.encode()).hexdigest(),
        "links": [[l["url"], l["kind"], l["method"]] for l in r["links"]],
    }


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in sorted(os.listdir(SAMPLES)):
        raw = open(os.path.join(SAMPLES, name), "rb").read()
        golden = extract_one(name, raw)
        safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in name)
        with open(os.path.join(OUT, safe + ".json"), "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        print(f"{name}: fmt={golden['format']} text_len={golden['text_len']} "
              f"n_links={len(golden['links'])}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    main()
