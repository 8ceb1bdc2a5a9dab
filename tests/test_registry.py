"""Registry semantics: recognizers, resolve/verify chain, fast-path parity."""

from vlm_ocr_doc_reader_ray.corpus.generator import (
    CORRUPT_PAYLOAD,
    build_html,
    build_spdf,
    is_corrupt_doc,
    is_pdf_doc,
)
from vlm_ocr_doc_reader_ray.extract import extract_document
from vlm_ocr_doc_reader_ray.extract.blocks import ExtractResult
from vlm_ocr_doc_reader_ray.extract.registry import (
    RegistryEntry,
    build_registry,
    resolve_entry,
    scan_entities,
    verify_entry,
)


def _result(text: str) -> ExtractResult:
    r = ExtractResult()
    r.text = text
    r.spans = [(0, len(text), "p", 0)]
    r._page_of_span[(0, len(text))] = 1
    return r


def test_recognizer_kinds_and_trailing_punct():
    r = _result(
        "Write to a.b@c.example.org today. See https://x.example.net/a/b. "
        "Call +1-555-0100. Due 2023-12-31. Code ABC-123456."
    )
    got = {e.kind: e.value for e in scan_entities(r)}
    assert got == {
        "email": "a.b@c.example.org",
        "url": "https://x.example.net/a/b",
        "phone": "+1-555-0100",
        "date": "2023-12-31",
        "id": "ABC-123456",
    }


def test_fast_path_equals_explicit_chain(small_documents):
    """build_registry (fused) == scan→resolve_entry→verify_entry (explicit)."""
    for doc_id, text, lang, source in small_documents[:120]:
        if is_corrupt_doc(doc_id):
            payload = CORRUPT_PAYLOAD
        elif is_pdf_doc(doc_id):
            payload = build_spdf(doc_id, text, lang, source)
        else:
            payload = build_html(doc_id, text, lang, source)
        res = extract_document(payload)
        if res.parse_status != "ok":
            continue
        fast = build_registry(res)
        slow = [
            verify_entry(resolve_entry(e, res.text), res.text)
            for e in scan_entities(res)
        ]
        assert fast == slow, doc_id


def test_out_of_range_span_is_error():
    r = _result("short text")
    bad = RegistryEntry(
        entity_id="scan_1_deadbeef", page_num=1, kind="email",
        prompt="p", resolution=0, value="x", context=None,
        verified=False, confidence=None, span_start=9999, span_end=10005,
    )
    resolved = resolve_entry(bad, r.text)
    assert resolved.status == "error"
    assert resolved.value == "x"  # original kept on failure
    verified = verify_entry(resolved, r.text)
    assert verified.resolution == 1  # all-error vote keeps previous state
    assert verified.verified is False


def test_no_data_when_window_misses():
    text = "nothing interesting here at all in this sentence"
    entry = RegistryEntry(
        entity_id="scan_1_aaaaaaaa", page_num=1, kind="email",
        prompt="p", resolution=0, value=None, context=None,
        verified=False, confidence=None, span_start=5, span_end=10,
    )
    v = verify_entry(entry, text)
    assert v.status == "no_data"
    assert v.value == ""
    assert v.confidence == "3/3"  # three unanimous no_data votes
    assert v.verified is True


def test_register_recognizer_extension_surface():
    """User extension: new kind participates in scan/resolve/verify."""
    import vlm_ocr_doc_reader_ray.extract.registry as reg_mod
    from vlm_ocr_doc_reader_ray.extract.registry import register_recognizer

    before = list(reg_mod.RECOGNIZERS)
    try:
        register_recognizer("ticket", r"\bTICKET#\d{4}\b")
        r = _result("Please see TICKET#1234 for the long running details today")
        got = {e.kind: e.value for e in reg_mod.scan_entities(r)}
        assert got.get("ticket") == "TICKET#1234"
        entries = reg_mod.build_registry(r)
        tickets = [e for e in entries if e.kind == "ticket"]
        assert tickets and tickets[0].verified and tickets[0].confidence == "3/3"
    finally:
        reg_mod.RECOGNIZERS[:] = before
        reg_mod._RECOGNIZER_MAP.pop("ticket", None)


def test_verify_grouped_keeps_unmatched_registry_rows(ray_session, sf_small):
    """LEFT-join contract: registry rows whose url is missing from the
    extracted side (filtered/partial extraction) must survive, voted
    against empty text (0/n confidence, original value kept) — never
    silently dropped."""
    import __ray_entry__ as m  # noqa: F401  (worker registration)
    from vlm_ocr_doc_reader_ray.pipelines.extraction import (
        extract,
        read_corpus,
        registry_table,
    )
    from vlm_ocr_doc_reader_ray.stages.registry_stage import verify_grouped

    ex = extract(read_corpus(sf_small), emit_spans=False, emit_registry=True)
    reg = registry_table(ex)
    n_reg = reg.count()
    assert n_reg > 0

    # drop half the extracted urls
    some_urls = sorted({r["url"] for r in reg.take(200)})
    keep = set(some_urls[::2])
    filtered = ex.filter(lambda row: row["url"] in keep)

    out = verify_grouped(reg, filtered).to_pandas()
    assert len(out) == n_reg  # nothing dropped

    unmatched = out[~out["url"].isin(keep)]
    assert len(unmatched) > 0
    # unmatched rows vote against empty text -> every axis errors ->
    # 0/n vote -> vote_batch keeps the ORIGINAL registry values
    orig = reg.to_pandas().set_index(["url", "entity_id"])
    for _, row in unmatched.head(20).iterrows():
        o = orig.loc[(row["url"], row["entity_id"])]
        assert row["value"] == o["value"]
        assert row["confidence"] == o["confidence"]
        assert bool(row["verified"]) == bool(o["verified"])
        assert int(row["resolution"]) == int(o["resolution"])


def test_axis_samples_fast_path_equals_naive_adversarial():
    """The single-search verify fast path must equal the naive
    per-axis chain even when repeated entity instances force
    radius-dependent matches (the slow path the corpus never hits)."""
    from vlm_ocr_doc_reader_ray.extract.registry import (
        RegistryEntry,
        _axis_samples,
        _window_extract,
    )

    email = "user1@a.example.com"
    cases = []
    # two instances close together: wide windows see the earlier one
    for gap in (10, 45, 80, 130, 190, 260):
        text = "x" * 30 + email + " " + "y" * gap + " " + email + " tail"
        second = text.index(email, 30 + len(email))
        cases.append((text, second))
        cases.append((text, 30))  # span on the FIRST instance too
    # no second instance: pure fast path
    t = "z" * 50 + email + " end"
    cases.append((t, 50))
    # invalid span: error path
    cases.append((t, 10 ** 6))

    axes = (1, 3, 5)
    for text, start in cases:
        e = RegistryEntry(
            entity_id="t", page_num=1, kind="email", prompt="p",
            resolution=0, value=email, context=None, verified=False,
            confidence=None, span_start=min(start, 10 ** 6),
            span_end=min(start, 10 ** 6) + len(email),
        )
        fast = _axis_samples(e, text, axes)
        naive = [_window_extract(e, text, 40 * a) for a in axes]
        assert fast == naive, (text[:40], start, fast, naive)
