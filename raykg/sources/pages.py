"""Deterministic synthetic `pages` table (the BASELINE.json input_hint shape).

Columns: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` — exactly the driver-hinted Common-Crawl-style shape. No
external data: page bodies are synthesized from (a) entity-bearing sentences
generated deterministically from fixed name pools keyed by ``doc_id`` (the
style of the reference benchmark corpus, e.g. "Amelia Reed met with Helios
Dynamics in Seattle …" —
/root/reference/Sources/Benchmarks/Resources/Fixtures/benchmark_samples.jsonl)
and (b) the driver's ``documents`` table text as entity-free filler.

Determinism: every page is a pure function of ``(seed, doc_id, filler,
lang)`` — independent of batch boundaries, worker count, and execution order,
which is what makes the distributed pipeline's output reproducible at any
parallelism level.

Corpus properties exercised on purpose:
- Zipf-skewed domains AND entity mentions (hot keys → canonicalization
  salting has real work);
- ~1/17 of pages exceed the 248-word chunking trigger (chunk/merge path);
- ~1/97 are empty-body; ~1/101 duplicate a neighbor's url with a later
  ``warc_ts`` (input dedup keeps the newest);
- HTML includes entities (&amp;), comments, <script>/<style>, nested tags and
  multi-byte UTF-8 so the byte-identity invariant is non-trivial.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta
from hashlib import blake2b

import numpy as np
import pyarrow as pa

from ..core.textextract import extract_text

EPOCH = datetime(2025, 1, 1)

PERSONS = [
    f"{f} {l}" for f, l in zip(
        ["Amelia", "Marcus", "Sofia", "David", "Yuki", "Elena", "Omar", "Priya",
         "Lucas", "Maria", "Chen", "Fatima", "Igor", "Nadia", "Tomás", "Ingrid",
         "Kwame", "Lars", "Aisha", "Hugo", "Mei", "Ravi", "Clara", "Jonas",
         "Zara", "Felix", "Anya", "Diego", "Leila", "Viktor"],
        ["Reed", "Tanaka", "Alvarez", "Kim", "Okafor", "Petrova", "Haddad",
         "Sharma", "Moreau", "Chen", "Wei", "Khan", "Sokolov", "Hassan",
         "García", "Larsen", "Mensah", "Nilsen", "Diallo", "Lefèvre", "Ling",
         "Iyer", "Schmidt", "Berg", "Qureshi", "Bauer", "Volkov", "Ramírez",
         "Nasser", "Orlov"])
]
ORGS = [
    f"{a} {b}" for a in ["Helios", "Northwind", "Vertex", "Quantum", "Atlas",
                         "Borealis", "Cascade", "Meridian", "Pinnacle", "Solstice"]
    for b in ["Dynamics", "Systems", "Labs", "Industries"]
]
LOCATIONS = ["Seattle", "Berlin", "Tokyo", "São Paulo", "Nairobi", "Oslo",
             "Mumbai", "Toronto", "Lyon", "Kraków", "Zürich", "Austin",
             "Singapore", "Dublin", "Montréal", "Bogotá", "Cairo", "Helsinki",
             "Valencia", "Busan"]
PRODUCTS = [f"{a}{b}" for a in ["Nimbus", "Aster", "Corva", "Delta", "Echo"]
            for b in [" One", " Pro", " Max", " Lite"]]
PUBLICATIONS = ["Annual Outlook", "Market Review", "Technology Quarterly",
                "Field Report", "Industry Survey", "Research Digest",
                "Data Almanac", "Trade Bulletin"]
DOMAINS = [f"news-{i:02d}.example.com" if i % 3 else f"site-{i:02d}.example.org"
           for i in range(50)]

# (template, needs) — names are drawn per-sentence; every template contains a
# predicate from raykg.core.relations.DEFAULT_PATTERNS so triples are dense.
_TEMPLATES = [
    ("{p} works at {o}.", "po"),
    ("{p} met with {p2} in {l}.", "pql"),
    ("{o} acquired {o2} last quarter.", "oq"),
    ("{p}, the CEO of {o}, visited {l}.", "pol"),
    ("{p} was born in {l}.", "pl"),
    ("{o} released {r} in {l}.", "orl"),
    ("{p} published the {b}.", "pb"),
    ("{o} partnered with {o2} on a joint venture.", "oq"),
    ("{p} visited {l} to meet customers.", "pl"),
    ("{p} signed an agreement with {o} Inc.", "po"),   # near-dup surface of {o}
    ("{o} is headquartered in {l}.", "ol"),
    ("{p} founded {o} together with {p2}.", "pqo"),
]


def _rng(doc_id: int, seed: int) -> np.random.Generator:
    h = int.from_bytes(blake2b(b"page|%d|%d" % (seed, doc_id),
                               digest_size=8).digest(), "big")
    return np.random.default_rng(h)


def _zipf_pick(rng: np.random.Generator, pool: list[str]) -> str:
    # u^3 biases toward low indices → Zipf-ish head-heavy skew (hot entities)
    return pool[int(len(pool) * float(rng.random()) ** 3) % len(pool)]


def synth_body(doc_id: int, filler: str, seed: int = 42) -> str:
    """Entity-bearing body text for one page. Pure function of its args."""
    if doc_id % 97 == 0:
        return ""
    rng = _rng(doc_id, seed)
    long_doc = doc_id % 17 == 0
    n_sent = int(rng.integers(3, 7)) * (6 if long_doc else 1)
    sents: list[str] = []
    for _ in range(n_sent):
        tpl, _needs = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
        p = _zipf_pick(rng, PERSONS)
        p2 = _zipf_pick(rng, PERSONS)
        o = _zipf_pick(rng, ORGS)
        o2 = _zipf_pick(rng, ORGS)
        sents.append(tpl.format(p=p, p2=p2, o=o, o2=o2,
                                l=_zipf_pick(rng, LOCATIONS),
                                r=_zipf_pick(rng, PRODUCTS),
                                b=_zipf_pick(rng, PUBLICATIONS)))
    paras: list[str] = []
    para: list[str] = []
    for i, s in enumerate(sents):
        para.append(s)
        if (i + 1) % 4 == 0:
            paras.append(" ".join(para))
            para = []
    if para:
        paras.append(" ".join(para))
    body = "\n\n".join(paras)
    if filler:
        body += "\n\n" + filler[: 400 if long_doc else 160]
    return body


def synth_html(doc_id: int, body: str, seed: int = 42) -> bytes:
    """Wrap a body in deliberately messy HTML (entities, script/style,
    comments, nested inline tags, multi-byte title)."""
    rng = _rng(doc_id ^ 0x5EED, seed)
    title = f"Dossier №{doc_id} — Ĉapitro {int(rng.integers(1, 99))} & more"
    paras = body.split("\n\n") if body else []
    chunks = []
    for i, p in enumerate(paras):
        esc = _html.escape(p)
        if i % 3 == 1:
            esc = esc.replace(" in ", " <b>in</b> ", 1)
        chunks.append(f"<p>{esc}</p>")
        if i % 4 == 2:
            chunks.append("<!-- tracking pixel removed -->")
    doc = (
        "<html><head>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body { font: 14px sans-serif; }</style>"
        "<script>var t = '<p>not text</p>';</script>"
        "</head><body>"
        f"<h1>{_html.escape(title)}</h1>"
        + "".join(chunks)
        + "<div class=\"footer\">&copy; 2025 &amp; contributors</div>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def make_page_row(doc_id: int, filler: str, lang: str, seed: int = 42) -> dict:
    """One (url, warc_ts, html, text, lang) row; the `text` column carries the
    frozen extractor's output, as the upstream producer would supply it."""
    dup = doc_id % 101 == 0 and doc_id > 0
    src_id = doc_id - 1 if dup else doc_id
    rng = _rng(src_id ^ 0xD0AA, seed)
    domain = _zipf_pick(rng, DOMAINS)
    url = f"https://{domain}/article/{src_id}"
    ts = EPOCH + timedelta(minutes=int(doc_id)) + (timedelta(days=1) if dup else timedelta())
    html_bytes = synth_html(src_id, synth_body(src_id, filler, seed), seed)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_bytes,
        "text": extract_text(html_bytes),
        "lang": lang,
    }


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def pages_batch(batch: pa.Table, seed: int = 42, repeat: int = 1) -> pa.Table:
    """map_batches UDF: documents rows → pages rows (Arrow in / Arrow out).

    ``repeat`` > 1 emits that many page VARIANTS per document (doc_id shifted
    by k·10^7 → different urls/entities/timestamps) — a deterministic corpus
    multiplier for benchmarking, independent of batch boundaries."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    rows = [make_page_row(d + k * 10_000_000, f, l, seed)
            for k in range(repeat)
            for d, f, l in zip(doc_ids, texts, langs)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_dataset(sf_dir: str, seed: int = 42, repeat: int = 1):
    """documents.parquet → synthetic pages Dataset (lazy, streaming)."""
    from .tables import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    return docs.map_batches(lambda b: pages_batch(b, seed, repeat),
                            batch_format="pyarrow")


def write_pages_parquet(sf_dir: str, out_dir: str, seed: int = 42,
                        repeat: int = 1, num_files: int | None = None) -> str:
    """Materialize the synthetic pages corpus once (bench warm path)."""
    ds = pages_dataset(sf_dir, seed, repeat)
    if num_files:
        ds = ds.repartition(num_files)
    ds.write_parquet(out_dir)
    return out_dir
