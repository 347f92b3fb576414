"""Index configuration (the engine-side analogue of miru's ``MiruSchema``).

The reference carries an explicit versioned schema per tenant
(``miru-api/.../activity/schema/MiruSchema.java:21-107``) where each field is
a feature bundle (indexed / multiValued / cardinality / stored,
``MiruFieldDefinition.java:59-127``).  Our equivalent: the Parquet schema is
the storage schema, and this config says which columns are indexed and how.
It is serialized into the index manifest (versioned with the index).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # fields tokenized into bare terms with tf counts (reference: the
    # `multiTermCardinality` feature — tf via HashMultiset in
    # MiruIndexPrimaryFields.compose, MiruIndexPrimaryFields.java:62-74)
    text_fields: tuple[str, ...] = ("text",)
    # fields indexed whole as `field:value` single terms, tf=1 (reference:
    # `singleTerm` fields, MiruFieldDefinition.java:59-78)
    keyword_fields: tuple[str, ...] = ("role", "tool")
    # list<string> columns indexed as one `field:value` term PER ELEMENT
    # (reference: `multiTerm` fields, MiruFieldDefinition.java:59-78; the
    # authz ACL list, MiruActivity.authz / MiruAuthzIndex, is the canonical
    # user — each ACL entry gets its own postings, queries OR a principal's
    # entries, MiruAuthzExpression)
    list_keyword_fields: tuple[str, ...] = ()
    # text fields that ALSO emit positions-free phrase-bigram terms
    # (`2g:<tok1> <tok2>` per adjacent token pair, after the same optional
    # stopword filter the unigrams saw).  Phrase queries over these fields
    # AND the bigram postings instead of the unigram postings: exact for
    # 2-token phrases (no docstore verification at all) and a far tighter
    # candidate set for longer ones — the positions-free answer to the
    # reference's Lucene positional phrases (LuceneBackedQueryParser),
    # trading ~1 extra posting/token of index size, opt-in per field.
    # The '2g:' prefix contains ':' so bigrams are excluded from doclen /
    # cf_text / BM25 exactly like keyword terms.
    phrase_bigram_fields: tuple[str, ...] = ()
    # text fields that ALSO store within-doc token POSITIONS per posting
    # (delta-gap varints, Lucene .prx-style — the reference defers phrase
    # positions to Lucene via LuceneBackedQueryParser).  Phrase queries of
    # ANY length over a positional field are answered entirely from the
    # index — AND the terms' postings, then intersect (doc, pos-i) keys —
    # no docstore gather at all.  Opt-in (~cf varint bytes of extra index).
    # Constraint (enforced at build): positional_fields must equal
    # text_fields and contain exactly ONE field — the position count per
    # posting must equal tf for the implied-split decode, which a second
    # text field sharing the term space would break.
    positional_fields: tuple[str, ...] = ()
    # power-bits fields: (bits_field, int64_source_column) pairs.  The
    # source value is indexed as its SET BITS — one `field:<i>` term per
    # set bit i plus a `field:+`/`field:-` sign term (the reference's
    # metric-sampler encoding, SampleTrawl.java:50-67: sign first, then
    # String.valueOf(i) per bit; Long.MIN_VALUE flips lossily to
    # Long.MAX_VALUE).  Bit-sliced aggregates (MetricsQuery/AnomalyQuery
    # per-segment SUM/AVG) are then pure postings algebra: ~65 terms per
    # field regardless of value cardinality.  The column is DERIVED at
    # index time; it need not exist in the input parquet.
    power_bits_fields: tuple[tuple[str, str], ...] = ()
    # composite fields: (name, (part_column, ...)) pairs.  The named field
    # is DERIVED at index time by composing the part columns' values into
    # ONE multi-part term (reference: MiruSchema.CompositeFieldDefinition;
    # MiruTermComposer.compose:35-63 length-prefixes all but the last
    # part).  Here parts join on a reserved separator (composer.PART_SEP,
    # 0x1f — below every printable char, so the term dict groups by
    # leading parts exactly like the reference's length-prefixed
    # encoding); part values containing the separator are rejected at
    # build/compose time.  A doc is indexed iff EVERY part is non-null and
    # non-empty.  Queries may supply a PREFIX of the parts (MiruValue
    # {"parts": [...]}) — evaluated as a complete-or-fail term-range scan
    # (prefixLowerInclusive/prefixUpperExclusive:176-240).
    composite_fields: tuple[tuple[str, tuple[str, ...]], ...] = ()
    # int64 columns indexed as `field:<lex>` terms where <lex> is the
    # order-preserving fixed-width encoding (miru_ray.lexnum) — numeric
    # range queries become contiguous term-dict range scans (reference:
    # numeric prefix type, MiruTermComposer.writePrefixBytes:130-141 via
    # UtilLexMarshaller sign-flipped big-endian;
    # prefixLowerInclusive/prefixUpperExclusive:176-240)
    numeric_fields: tuple[str, ...] = ()
    # docs per index partition (reference: partition rollover by capacity,
    # MiruPartitioner.java:92-108; "millions of ordered documents" README:12).
    # Tests use small values; at 100 TB size this to a few million docs so a
    # partition's doclen/ts arrays stay ~tens of MB per reader actor.
    docs_per_partition: int = 100_000
    # term-hash shards per partition: the explicit skew bound for the
    # groupby((partition, shard)) shuffle — a hot term's postings are split
    # across partitions (doc-locality salt) and its shard-mates bounded by
    # partition size (reference precedent: atomized posting containers,
    # LabInvertedIndex.java:268-292)
    num_shards: int = 4
    remove_stopwords: bool = False
    # postings shuffle implementation:
    #   "external" (default) — map-side partitioned parquet write keyed by
    #     (partition, shard), then one independent encode task per cell.
    #     Every posting row is written once and read once (same IO as an
    #     object-store shuffle) with NO comparison sort, and the postings
    #     directory doubles as a per-cell resume checkpoint.  On a cluster
    #     this is a standard external (storage-backed) shuffle.
    #   "groupby" — Ray-native groupby(gkey).map_groups sort shuffle through
    #     the object store (measured ~3× slower here: the sort pays ~600
    #     CPU-s ordering 160M string-carrying rows it doesn't need ordered).
    shuffle_mode: str = "external"
    # codec for the docstore + postings-spill parquet writes (execution
    # knob: affects bytes on disk, never logical content).  zstd ~25%
    # smaller than snappy on this text at ~5% more build CPU (BENCH.md
    # codec A/B); pick snappy when build CPU is the scarce resource.
    io_compression: str = "zstd"
    # run the doc-store write and the postings spill as concurrent Dataset
    # executions (spill assigns doc ids inline from the broadcast offsets).
    # Off by default: on a single box two streaming executors oversubscribe
    # the same CPUs and the total gets worse (measured); on a real cluster
    # with separate IO/CPU bottlenecks it can hide the docstore write.
    overlap_stages: bool = False
    # BM25 constants (conventional defaults; the reference's own scorer has
    # no k1/b — see SURVEY.md §2.12)
    k1: float = 1.2
    b: float = 0.75
    ts_field: str = "ts"
    id_fields: tuple[str, ...] = ("conv_id", "turn_idx")

    def content_dict(self) -> dict:
        """Only the fields that determine INDEX BYTES.  Execution knobs
        (shuffle_mode, overlap_stages) and query-time constants (k1, b)
        are excluded so stage checkpoints remain valid across them —
        different shuffle paths must produce byte-identical segments."""
        d = self.to_dict()
        for k in ("shuffle_mode", "overlap_stages", "k1", "b",
                  "io_compression"):
            d.pop(k)
        return d

    def to_dict(self) -> dict:
        d = asdict(self)
        for k in ("text_fields", "keyword_fields", "list_keyword_fields",
                  "numeric_fields", "id_fields", "phrase_bigram_fields",
                  "positional_fields"):
            d[k] = list(d[k])
        d["power_bits_fields"] = [list(p) for p in d["power_bits_fields"]]
        d["composite_fields"] = [[n, list(p)]
                                 for n, p in d["composite_fields"]]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        d = dict(d)
        d.setdefault("list_keyword_fields", ())
        d.setdefault("numeric_fields", ())
        d.setdefault("phrase_bigram_fields", ())
        d.setdefault("positional_fields", ())
        d.setdefault("power_bits_fields", ())
        for k in ("text_fields", "keyword_fields", "list_keyword_fields",
                  "numeric_fields", "id_fields", "phrase_bigram_fields",
                  "positional_fields"):
            d[k] = tuple(d[k])
        d["power_bits_fields"] = tuple(tuple(p)
                                       for p in d["power_bits_fields"])
        d.setdefault("composite_fields", ())
        d["composite_fields"] = tuple((n, tuple(p))
                                      for n, p in d["composite_fields"])
        return cls(**d)
