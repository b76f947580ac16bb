"""Deterministic synthetic spans/media fixtures (FIXTURES.md).

Seed-fixed (seed=42), pure: no wall-clock, no ambient randomness.  Emits
the exact input shape mandated by BASELINE.json ``input_hint``:

  documents(doc_id string,
            spans array<struct<kind string, text string,
                               media_ref string, offset int>>)

plus the deterministic media store (FIXTURES.md §2, extended with the
per-page OCR column needed to exercise the reference's direct-text ->
OCR fallback, /root/reference/app.py:778-804):

  media(media_ref string, pages array<string>, ocr_pages array<string>)

Written as Parquet via pyarrow (no Spark needed to generate).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# --- document bodies ----------------------------------------------------------

# canonical COA — verbatim reference fixture
# (/root/reference/test_dynamic_extraction.py:9-23, FIXTURES.md §3.1)
CANONICAL_COA = """Certificate of Analysis
Acetone
Propan-2-one/ Dimethyl ketone (C3H6O)
HS Code: 29141100
CAS Number: 67-64-1
Date of Issue: 98.03.07
Test Method Units Specification
Limits Results
Min Max
Appearance Visual - Colorless, Clear liquid Colorless, Clear liquid
Density @ 20֯ C ASTM D 1298 g/ml 0.79 0.79
Water ASTM D 1364 % wt 0.5 0.33
Acidity as acetic acid ASTM D 1613 % wt - 0.01 0.005
Purity ASTM D 3545 % wt 97 0.13 MOH 97.01AC 2.53 Uk"""

PRODUCTS = ["Acetone", "Ethanol 96%", "TechBond X-500", "Glycerol USP", "Toluene HPLC"]
COMPANIES = ["Example Corp", "Acme Chemical", "Nordic Labs", "Quanta Reagents"]
USES = ["bonding metal substrates", "surface cleaning", "laboratory analysis"]


def template_coa(rng: random.Random) -> str:
    product = rng.choice(PRODUCTS)
    batch = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(3)) + str(
        rng.randint(100, 99999)
    )
    cas = f"{rng.randint(50, 9999999)}-{rng.randint(10, 99)}-{rng.randint(0, 9)}"
    purity = f"{rng.uniform(97.0, 99.99):.2f}"
    water = f"{rng.uniform(0.01, 0.49):.2f}"
    hm = rng.randint(1, 9)
    dd, mm, yyyy = rng.randint(1, 28), rng.randint(1, 12), rng.randint(2015, 2024)
    return f"""CERTIFICATE OF ANALYSIS
Product Name: {product}
Batch Number: {batch}
CAS Number: {cas}
Analysis Date: {dd:02d}/{mm:02d}/{yyyy}

Parameter          Specification        Result
Purity             >= 99.0 %            {purity} %
Water content      <= 0.5 %             {water} %
Appearance         Clear liquid         Clear liquid
Heavy metals       < 10 ppm             {hm} ppm

This lot conforms to specification."""


def template_sds(rng: random.Random) -> str:
    product = rng.choice(PRODUCTS)
    company = rng.choice(COMPANIES)
    cas = f"{rng.randint(50, 9999999)}-{rng.randint(10, 99)}-{rng.randint(0, 9)}"
    h1, h2 = rng.choice(["H225", "H301", "H315"]), rng.choice(["H319", "H336", "H411"])
    phone = f"+1 {rng.randint(200, 999)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}"
    return f"""SAFETY DATA SHEET
SECTION 1: Identification
Product Name: {product}
CAS Number: {cas}
Manufacturer: {company}
Emergency telephone: {phone}
SECTION 2: Hazards identification
Hazard statements: {h1}, {h2}
SECTION 3: Composition
Main component {product} (CAS {cas}) at concentration >= 95%."""


def template_tds(rng: random.Random) -> str:
    product = rng.choice(PRODUCTS)
    d = f"{rng.uniform(0.7, 1.4):.2f}"
    v = f"{rng.uniform(1.0, 900.0):.1f}"
    fp = f"{rng.uniform(-20.0, 120.0):.0f}"
    use = rng.choice(USES)
    return f"""TECHNICAL DATA SHEET
Product Name: {product}
Technical Properties
Density: {d} g/cm3
Viscosity: {v} mPas
Flash Point: {fp} °C
Applications
Recommended for {use}.
Storage: Store at 5-25°C"""


def template_html(rng: random.Random) -> str:
    product = rng.choice(PRODUCTS)
    batch = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(3)) + str(
        rng.randint(100, 99999)
    )
    purity = f"{rng.uniform(97.0, 99.99):.2f}"
    year = rng.randint(2015, 2024)
    return (
        f"<html><head><title>{product} COA</title><style>body{{margin:0}}</style>"
        "</head><body>"
        "<nav><ul><li><a href='/'>Home</a></li><li><a href='/p'>Products</a></li>"
        "</ul></nav>"
        '<div class="content"><h1>Certificate of Analysis</h1>'
        f"<p>Product Name: {product}</p><p>Batch Number: {batch}</p>"
        "<table><tr><th>Parameter</th><th>Specification</th><th>Result</th></tr>"
        f"<tr><td>Purity</td><td>&gt;= 99.0 %</td><td>{purity} %</td></tr></table>"
        f"</div><footer>© {year} Example Corp. All rights reserved.</footer>"
        "</body></html>"
    )


EDGE_CASES = [
    ("edge_empty", ""),
    ("edge_whitespace", "   \n\t  \n  "),
    ("edge_no_markers", "The quick brown fox jumps over the lazy dog.\nNothing here."),
    # equal SDS+COA hits -> tie -> unknown/0.3 (ai:267)
    ("edge_tie", "safety data sheet\ncertificate of analysis\n"),
    ("edge_long", "Product Name: LongDoc\n" + "filler line of text\n" * 300),
    ("edge_unicode", "Certificate of Analysis\nDensity @ 20֯ C ASTM D 1298 g/ml 0.79 0.81\nTemp range 5–25 °C\n"),
    ("edge_kv_only", "Some Field: some value\nAnother Key: another value\nHS Code: 12345\n"),
    (
        "edge_two_part_rows",
        "Certificate of Analysis\nParameter  Specification  Result\npH  6.8\nColor  None  Clear\n\nEnd.",
    ),
    (
        "edge_pass_fail",
        "Certificate of Analysis\nIdentity Test: PASS\nResidue: <10 ppm - 4 ppm\n",
    ),
]


def _paginate(body: str, n_pages: int) -> list[str]:
    lines = body.split("\n")
    if n_pages <= 1 or len(lines) < n_pages:
        return [body]
    per = (len(lines) + n_pages - 1) // n_pages
    return ["\n".join(lines[i : i + per]) for i in range(0, len(lines), per)]


class SpanBuilder:
    """Accumulates documents + media rows with contiguous offsets."""

    def __init__(self) -> None:
        self.docs: list[dict] = []
        self.media: list[dict] = []

    def _media_ref(self, doc_id: str, offset: int) -> str:
        return f"media://{doc_id}/{offset}"

    def add(self, doc_id: str, parts: list[tuple[str, str, dict]]) -> None:
        """parts: list of (kind, body, opts); opts for media kinds:
        {"n_pages": int, "scanned": bool} — scanned PDFs have no text layer
        (empty direct pages) and decode via the OCR path."""
        spans = []
        for offset, (kind, body, opts) in enumerate(parts):
            if kind in ("text", "html"):
                spans.append(
                    {"kind": kind, "text": body, "media_ref": None, "offset": offset}
                )
            else:
                ref = self._media_ref(doc_id, offset)
                pages = _paginate(body, opts.get("n_pages", 1))
                scanned = opts.get("scanned", False)
                self.media.append(
                    {
                        "media_ref": ref,
                        "pages": ["" for _ in pages] if scanned else pages,
                        "ocr_pages": pages,
                    }
                )
                spans.append(
                    {"kind": kind, "text": None, "media_ref": ref, "offset": offset}
                )
        self.docs.append({"doc_id": doc_id, "spans": spans})


def build_parity_corpus() -> SpanBuilder:
    """~60 docs: every template × {text, pdf, image, html-ish} + edge cases
    (FIXTURES.md §4 fixtures_parity)."""
    rng = random.Random(SEED)
    b = SpanBuilder()
    templates = [
        ("canonical_coa", lambda r: CANONICAL_COA),
        ("coa", template_coa),
        ("sds", template_sds),
        ("tds", template_tds),
    ]
    i = 0
    for name, make in templates:
        for variant in range(3):
            body = make(rng)
            b.add(f"doc-{i:08d}-{name}-text", [("text", body, {})])
            b.add(
                f"doc-{i:08d}-{name}-pdftext",
                [("pdf", body, {"n_pages": 2, "scanned": False})],
            )
            b.add(
                f"doc-{i:08d}-{name}-pdfscan",
                [("pdf", body, {"n_pages": 2, "scanned": True})],
            )
            b.add(f"doc-{i:08d}-{name}-image", [("image", body, {})])
            i += 1
    for variant in range(3):
        b.add(f"doc-{i:08d}-html", [("html", template_html(rng), {})])
        i += 1
    # interleaved multi-span docs: text + media + text (FIXTURES.md §4 note)
    for variant in range(3):
        b.add(
            f"doc-{i:08d}-interleaved",
            [
                ("text", template_coa(rng), {}),
                ("pdf", template_sds(rng), {"n_pages": 3, "scanned": variant % 2 == 0}),
                ("text", template_tds(rng), {}),
                ("image", "Batch Number: ZZZ999\n", {}),
            ],
        )
        i += 1
    # a PDF with >5 pages of text layer and >2 OCR pages (page-cap semantics)
    b.add(
        f"doc-{i:08d}-fatpdf",
        [("pdf", template_coa(rng) + "\n" + "extra line\n" * 40, {"n_pages": 7})],
    )
    i += 1
    # a scanned PDF whose direct text layer is short (<100 chars -> OCR path)
    b.add(
        f"doc-{i:08d}-shorttext",
        [("pdf", "tiny", {"n_pages": 1, "scanned": False})],
    )
    i += 1
    for name, body in EDGE_CASES:
        b.add(f"doc-{i:08d}-{name}", [("text", body, {})])
        i += 1
    # zero-span document: survives the pipeline with empty out_spans
    b.add(f"doc-{i:08d}-edge_zero_spans", [])
    i += 1
    return b


def build_bench_corpus(n_docs: int, seed: int = SEED) -> SpanBuilder:
    """Bench mix (FIXTURES.md §4 bench_sfN): 80% thin text/html 1-span,
    15% pdf 2-5 spans, 5% fat 20-200 media spans (skew drivers)."""
    rng = random.Random(seed)
    b = SpanBuilder()
    makers = [template_coa, template_sds, template_tds]
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        roll = rng.random()
        if roll < 0.70:
            b.add(doc_id, [("text", makers[i % 3](rng), {})])
        elif roll < 0.80:
            b.add(doc_id, [("html", template_html(rng), {})])
        elif roll < 0.95:
            n = rng.randint(2, 5)
            parts = [
                ("pdf", makers[(i + k) % 3](rng), {"n_pages": 2, "scanned": k % 2 == 0})
                for k in range(n)
            ]
            b.add(doc_id, parts)
        else:
            n = rng.randint(20, 200)
            parts = [("image", template_coa(rng), {}) for _ in range(n)]
            b.add(doc_id, parts)
    return b


def build_skew_corpus(n_thin: int = 10_000, fat_spans: int = 200) -> SpanBuilder:
    """10k thin text docs + 1 doc with ``fat_spans`` media spans
    (FIXTURES.md §4 fixtures_skew)."""
    rng = random.Random(SEED)
    b = SpanBuilder()
    for i in range(n_thin):
        b.add(f"doc-{i:08d}", [("text", template_coa(rng), {})])
    b.add(
        "doc-fat",
        [("image", template_coa(rng), {}) for _ in range(fat_spans)],
    )
    return b


def build_resume_corpus(n_docs: int = 10_000) -> SpanBuilder:
    rng = random.Random(SEED)
    b = SpanBuilder()
    for i in range(n_docs):
        b.add(f"doc-{i:08d}", [("text", template_coa(rng), {})])
    return b


# --- parquet writers ----------------------------------------------------------

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("pages", pa.list_(pa.string())),
        ("ocr_pages", pa.list_(pa.string())),
    ]
)


def write_corpus(
    builder: SpanBuilder, docs_path: str, media_path: str, n_files: int = 1
) -> None:
    """Write the corpus as Parquet.  ``n_files > 1`` writes a directory of
    part files (the realistic shape of a large table — it is also what
    gives the Spark scan its input splits; a single small file can never
    parallelize the read)."""
    docs_table = pa.Table.from_pylist(builder.docs, schema=DOCS_SCHEMA)
    media_table = pa.Table.from_pylist(builder.media, schema=MEDIA_SCHEMA)
    if n_files <= 1:
        pq.write_table(docs_table, docs_path)
        pq.write_table(media_table, media_path)
        return
    import os

    for path, table in ((docs_path, docs_table), (media_path, media_table)):
        os.makedirs(path, exist_ok=True)
        n = table.num_rows
        per = (n + n_files - 1) // n_files
        for i in range(n_files):
            chunk = table.slice(i * per, per)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))


def media_lookup(builder: SpanBuilder):
    """In-memory media resolver for the single-node oracle."""
    table = {
        m["media_ref"]: (list(m["pages"]), list(m["ocr_pages"])) for m in builder.media
    }
    return lambda ref: table.get(ref, ([], []))
