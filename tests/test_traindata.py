"""Training-data operator tests: dedup family, similarity search,
text stats, multimodal plumbing — each against a pure-Python oracle
computed on the same rows."""

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from atra_spark.functions import dedup, multimodal, similarity, textstats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different text about spark and shuffles here"),
    (4, "the quick brown fox leaps over the lazy dog"),
    (5, "tiny"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _tokens(t):
    return t.split()


def _shingles(t, k=3):
    toks = _tokens(t)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a, b):
    i = len(a & b)
    return i / (len(a) + len(b) - i) if (a or b) else 0.0


class TestExactDedup:
    def test_groups(self, spark, docs_df):
        rows = {r["content_hash"]: r for r in dedup.exact_dedup(docs_df).collect()}
        dup_groups = [r for r in rows.values() if r["n_dups"] > 1]
        assert len(dup_groups) == 1
        assert dup_groups[0]["keeper"] == 0 and dup_groups[0]["n_dups"] == 2


class TestShinglesAndJaccard:
    def test_shingles_match_python(self, spark, docs_df):
        got = {}
        for r in dedup.shingles(docs_df).collect():
            got.setdefault(r["id"], set()).add(r["sh"])
        for doc_id, text in DOCS:
            assert got.get(doc_id, set()) == _shingles(text), doc_id

    def test_jaccard_pairs_match_python(self, spark, docs_df):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.3).collect()
        }
        expected = {}
        for (ida, ta), (idb, tb) in itertools.combinations(DOCS, 2):
            j = _jaccard(_shingles(ta), _shingles(tb))
            if j >= 0.3:
                expected[(ida, idb)] = j
        assert set(got) == set(expected)
        for k in got:
            assert abs(got[k] - expected[k]) < 1e-9


class TestMinHash:
    def test_lsh_catches_exact_dups_and_near_dups(self, spark, docs_df):
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_candidates(docs_df).collect()
        }
        assert (0, 2) in pairs  # exact dup always collides
        # high-jaccard near-dups (0,1) share most shingles
        assert (0, 1) in pairs or (1, 2) in pairs
        # completely different doc should not pair with everything
        assert (3, 5) not in pairs

    def test_signatures_deterministic(self, spark, docs_df):
        a = sorted(map(tuple, dedup.minhash_signatures(docs_df).collect()))
        b = sorted(map(tuple, dedup.minhash_signatures(docs_df).collect()))
        assert a == b


class TestConnectedComponents:
    def _cc(self, spark, edges, max_iters=25):
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        rows = dedup.connected_components(pairs, max_iters=max_iters).collect()
        return {r["doc_id"]: r["cluster_id"] for r in rows}

    def test_chain_needs_propagation(self, spark):
        # 0-1-2-3-4 chain: label 0 must travel 4 hops
        got = self._cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}

    def test_two_components_and_star(self, spark):
        got = self._cc(spark, [(10, 11), (11, 12), (20, 21), (22, 21), (23, 21)])
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 23: 20}

    def test_matches_pure_python_on_lsh_pairs(self, spark, docs_df):
        pairs_df = dedup.minhash_lsh_candidates(docs_df)
        edges = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
        got = self._cc(spark, edges)
        # pure-python union-find oracle
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for n in parent}
        assert got == want


class TestSimHash:
    def test_matches_pure_python(self, spark, docs_df):
        """JVM simhash == the pure-Python definition: 60-bit md5-prefix
        token hash, +1/-1 vote per bit over token OCCURRENCES."""

        def tok_hash(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

        def py_simhash(t):
            toks = t.lower().split()
            if not toks:
                return 0
            sig = 0
            for b in range(dedup.SIMHASH_BITS):
                vote = sum(1 if (tok_hash(tk) >> b) & 1 else -1 for tk in toks)
                if vote > 0:
                    sig |= 1 << b
            return sig

        got = {r["id"]: r["simhash"] for r in dedup.simhash(docs_df).collect()}
        for doc_id, text in DOCS:
            assert got[doc_id] == py_simhash(text), doc_id

    def test_near_pairs(self, spark, docs_df):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(docs_df, max_hamming=8).collect()
        }
        assert pairs.get((0, 2)) == 0  # exact dups -> distance 0
        # one-token-different docs are close
        assert (0, 1) in pairs or (0, 4) in pairs

    def test_banding_recall_guarantee(self, spark):
        """Plant signature pairs at every Hamming distance 1..12 and
        require 100% recall at max_hamming=12 — the round-1 fixed-4-band
        blocking missed any pair differing in all four bands."""
        rng = np.random.default_rng(7)
        rows = [(0, int(rng.integers(0, 1 << 60)))]
        base = rows[0][1]
        expected = set()
        for h in range(1, 13):
            # flip h distinct, spread-out bit positions so multiple bands differ
            positions = rng.choice(60, size=h, replace=False)
            sig = base
            for p in positions:
                sig ^= 1 << int(p)
            rows.append((h, sig))
            expected.add((0, h))
        sig_df = spark.createDataFrame(rows, "id long, simhash long")
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs_from_sigs(sig_df, max_hamming=12).collect()
        }
        for pair in expected:
            assert pair in got, f"missed planted pair {pair}"
            assert got[pair] == pair[1]

    def test_band_slices_cover_all_bits(self):
        for n_bands in (1, 4, 13, 60, 61):
            sl = dedup.band_slices(60, n_bands)
            assert sum(w for _, w in sl) == 60
            assert sl[0][0] == 0
            for (o1, w1), (o2, _) in zip(sl, sl[1:]):
                assert o1 + w1 == o2
            assert all(w >= 1 for _, w in sl)


class TestHotShingleCap:
    def test_cap_drops_hot_shingle_and_keeps_pairs(self, spark):
        """One shingle present in 50% of docs must not create a quadratic
        join; with a consistent cap the surviving pair set is computed on
        the capped shingle universe."""
        hot = "aaa bbb ccc"
        docs = []
        for i in range(40):
            if i % 2 == 0:
                docs.append((i, f"{hot} unique{i} tail{i} more{i}"))
            else:
                docs.append((i, f"text{i} unique{i} tail{i} more{i}"))
        # two true near-dups that do NOT rely on the hot shingle
        docs.append((100, "alpha beta gamma delta epsilon zeta"))
        docs.append((101, "alpha beta gamma delta epsilon eta"))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=0.4, max_shingle_df=5
            ).collect()
        }
        assert (100, 101) in pairs
        # hot-shingle-only pairs are gone (their only common shingle was capped)
        assert all(not (a < 40 and b < 40) for a, b in pairs)

    def test_no_cap_matches_capped_on_cold_corpus(self, spark, docs_df):
        """On a corpus with no hot shingles the cap is a no-op."""
        a = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in dedup.ngram_jaccard_pairs(docs_df).collect()
        }
        b = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in dedup.ngram_jaccard_pairs(docs_df, max_shingle_df=100).collect()
        }
        assert a == b


class TestTfIdf:
    """Formulas must match tf_idf.rs exactly (incl. the reference's
    total-occurrence idf frequency, corpus.rs:102-110)."""

    DOCS2 = [
        (0, "a b b c"),
        (1, "a a d"),
        (2, "e e e a"),
    ]

    @pytest.fixture(scope="class")
    def docs2(self, spark):
        return spark.createDataFrame(self.DOCS2, "doc_id long, text string")

    def _py_tfidf(self, tf_kind="term_frequency", idf_kind="idf_smooth"):
        import math
        from collections import Counter

        docs = {i: t.split() for i, t in self.DOCS2}
        wf = Counter(w for ws in docs.values() for w in ws)
        n = float(len(docs))
        out = {}
        for i, ws in docs.items():
            c = Counter(ws)
            for w, cnt in c.items():
                if tf_kind == "term_frequency":
                    tf = cnt / sum(c.values())
                elif tf_kind == "raw_count":
                    tf = float(cnt)
                elif tf_kind == "log_normalization":
                    tf = math.log10(cnt + 1.0)
                if idf_kind == "idf_smooth":
                    idf = math.log10(n / (wf[w] + 1.0)) + 1.0
                elif idf_kind == "idf":
                    idf = math.log10(n / wf[w])
                elif idf_kind == "idf_probabilistic":
                    idf = (n - wf[w]) / wf[w]
                out[(i, w)] = tf * idf
        return out

    @pytest.mark.parametrize(
        "tf_kind,idf_kind",
        [
            ("term_frequency", "idf_smooth"),
            ("raw_count", "idf"),
            ("log_normalization", "idf_probabilistic"),
        ],
    )
    def test_matches_reference_formulas(self, spark, docs2, tf_kind, idf_kind):
        from atra_spark.functions import tfidf

        got = {
            (r["id"], r["word"]): r["tf_idf"]
            for r in tfidf.tf_idf(docs2, tf=tf_kind, idf=idf_kind).collect()
        }
        exp = self._py_tfidf(tf_kind, idf_kind)
        assert set(got) == set(exp)
        for k in exp:
            assert abs(got[k] - exp[k]) < 1e-12, k

    def test_vectorize_topk_ranks(self, spark, docs2):
        from atra_spark.functions import tfidf

        rows = tfidf.vectorize_topk(docs2, k=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["word"]))
        assert all(len(v) == 2 for v in by_doc.values())
        # doc 2: 'e' (3 occurrences, rare) must outrank shared 'a'
        assert sorted(by_doc[2])[0][1] == "e"

    def test_cosine_pairs_self_similarity(self, spark, docs2):
        from atra_spark.functions import tfidf

        vec = tfidf.tf_idf(docs2).select("id", "word", "tf_idf")
        sims = {
            (r["ida"], r["idb"]): r["cosine"]
            for r in tfidf.cosine_pairs(vec, vec).collect()
        }
        for i in (0, 1, 2):
            assert abs(sims[(i, i)] - 1.0) < 1e-9


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs_df(self, spark):
        rng = np.random.default_rng(7)
        rows = [(i, rng.standard_normal(16).astype(float).tolist()) for i in range(200)]
        self.__class__.rows = rows
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_bruteforce_matches_numpy(self, spark, vecs_df):
        rows = self.rows
        q = rows[0][1]
        got = [r["id"] for r in similarity.cosine_topk(vecs_df, q, k=5).collect()]
        qv = np.array(q)
        # numpy oracle over float32-rounded vectors (Spark stores float32)
        sims = []
        for i, v in rows:
            v32 = np.array(v, dtype=np.float32).astype(float)
            sims.append((float(v32 @ qv / (np.linalg.norm(v32) * np.linalg.norm(qv))), i))
        expected = [i for _, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        assert got == expected

    def test_lsh_recall_contains_top1(self, spark, vecs_df):
        rows = self.rows
        q = rows[5][1]
        exact = [r["id"] for r in similarity.cosine_topk(vecs_df, q, k=3).collect()]
        approx = [
            r["id"]
            for r in similarity.lsh_bucketed_topk(vecs_df, q, k=3, multiprobe=2).collect()
        ]
        assert exact[0] in approx  # query itself (cos=1) must be found

    def test_bucket_assignment_deterministic(self, spark, vecs_df):
        a = sorted(map(tuple, similarity.add_lsh_bucket(vecs_df, 16).select("vec_id", "lsh_bucket").collect()))
        b = sorted(map(tuple, similarity.add_lsh_bucket(vecs_df, 16).select("vec_id", "lsh_bucket").collect()))
        assert a == b

    def _centroids(self, vecs_df):
        return vecs_df.filter(F.col("vec_id").between(1, 6)).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )

    def test_ivf_assign_matches_numpy(self, spark, vecs_df):
        rows = self.rows
        cents = {i: np.array(v, dtype=np.float32).astype(float) for i, v in rows if 1 <= i <= 6}
        got = {
            r["vec_id"]: r["cell"]
            for r in similarity.ivf_assign(vecs_df, self._centroids(vecs_df)).collect()
        }
        for i, v in rows:
            v32 = np.array(v, dtype=np.float32).astype(float)
            scores = {c: float(v32 @ cv / np.linalg.norm(cv)) for c, cv in cents.items()}
            best = max(scores.values())
            want = min(c for c, s in scores.items() if s == best)
            assert got[i] == want, i

    def test_ivf_topk_contains_query_vector(self, spark, vecs_df):
        rows = self.rows
        q = rows[9][1]
        approx = [
            r["id"]
            for r in similarity.ivf_topk(
                vecs_df, q, self._centroids(vecs_df), k=3, n_probe=2
            ).collect()
        ]
        # vec 9 itself (cosine 1.0) lives in the query's own best cell
        assert 9 in approx

    def test_ivf_candidates_are_probed_cells_only(self, spark, vecs_df):
        cents = self._centroids(vecs_df)
        q = self.rows[9][1]
        assigned = {
            r["vec_id"]: r["cell"] for r in similarity.ivf_assign(vecs_df, cents).collect()
        }
        got = [
            r["id"] for r in similarity.ivf_topk(vecs_df, q, cents, k=50, n_probe=1).collect()
        ]
        cells_hit = {assigned[i] for i in got}
        assert len(cells_hit) == 1  # n_probe=1 -> exactly one cell searched


class TestTextStats:
    def test_quality_metrics(self, spark, docs_df):
        rows = {r["id"]: r for r in textstats.quality_metrics(docs_df).collect()}
        t0 = DOCS[0][1]
        assert rows[0]["n_chars"] == len(t0)
        assert rows[0]["n_tokens"] == len(t0.split())
        assert rows[5]["n_tokens"] == 1

    def test_lang_scores(self, spark):
        df = spark.createDataFrame(
            [
                (0, "the data and the value of the table"),
                (1, "der wert und das netz ist ein gutes netz"),
                (2, "zzz qqq 123"),
            ],
            "doc_id long, text string",
        )
        rows = {r["id"]: r["lang"] for r in textstats.lang_scores(df).collect()}
        assert rows[0] == "eng" and rows[1] == "deu" and rows[2] == "und"

    def test_tokenizer(self, spark, docs_df):
        got = {r["id"]: r["toks"] for r in docs_df.select(
            F.col("doc_id").alias("id"), textstats.tokenize_udf(F.col("text")).alias("toks")
        ).collect()}
        assert got[5] == ["tiny"]
        assert "the" not in got[0]  # stopword removed

    def test_rolling_fingerprints_detect_containment(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
        df = spark.createDataFrame(
            [(0, base), (1, base + " extra tail words here now"), (2, "unrelated " * 40)],
            "doc_id long, text string",
        )
        fps = {}
        for r in textstats.rolling_fingerprints(df).collect():
            fps.setdefault(r["id"], set()).add((r["bucket"], r["fp"]))
        overlap01 = len(fps[0] & fps[1]) / len(fps[0])
        overlap02 = len(fps[0] & fps[2]) / len(fps[0])
        assert overlap01 > 0.8 and overlap02 < 0.2


class TestRepetitionMetrics:
    def test_constructed_docs(self, spark):
        docs = [
            # 4 lines, 'dup dup' twice -> dup_line_frac = (4-3)/4
            (0, "aaaa bbbb\ndup dup\ndup dup\ncccc dddd eeee"),
            (1, "all unique lines\nhere for sure"),
            (2, "x y " * 10),        # 'x y'/'y x' dominate bigrams
            (3, ""),                 # empty -> all zeros
            (4, "one"),              # no bigram possible
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        from atra_spark.functions.textstats import repetition_metrics

        got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
        assert got[0]["dup_line_frac"] == 0.25
        # chars: 'aaaa bbbb'=9, 'dup dup'=7 x2, 'cccc dddd eeee'=14
        # -> dup chars 14 over total 37
        assert got[0]["dup_line_char_frac"] == round(14 / 37, 4)
        assert got[1]["dup_line_frac"] == 0.0
        # doc 2: tokens = [x y]*10 -> 19 bigrams, 'x y' x10 -> 10/19
        assert got[2]["top_bigram_frac"] == round(10 / 19, 4)
        assert got[3]["dup_line_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0
        assert got[4]["top_bigram_frac"] == 0.0

    def test_matches_sql_twin_on_spark(self, spark):
        """The spark-dialect SQL twin and the DataFrame implementation
        agree — the same check the driver runs cross-engine."""
        import __spark_entry__ as e
        from atra_spark.functions.textstats import repetition_metrics

        docs = [(i, f"line {i % 3}\nline {i % 3}\nuniq {i}") for i in range(40)]
        spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
            "documents"
        )
        a = sorted(map(tuple, repetition_metrics(spark.table("documents")).collect()))
        b = sorted(map(tuple, spark.sql(e.sql_repetition_metrics("spark")).collect()))
        assert a == b


class TestMultimodal:
    def test_feature_extraction_real_decode(self, spark):
        media = multimodal.synth_media(spark, n=32)
        feats = {r["media_id"]: r for r in multimodal.extract_media_features(media).collect()}
        assert len(feats) == 32
        # slot layout: 0=png 1=gif 2=bmp/jpeg 3=wav
        # 4=progressive-jpeg(unsupported) 5=png-near-dup 6=corrupt-png
        # 7=empty
        assert feats[0]["sniffed_mime"] == "image/png"
        assert feats[0]["decoded"] == "ok"
        assert feats[0]["width"] == 16 and feats[0]["channels"] == 3
        assert feats[0]["ahash"] is not None and feats[0]["mean_luma"] is not None
        assert feats[1]["sniffed_mime"] == "image/gif"
        assert feats[1]["decoded"] == "ok" and feats[1]["n_frames"] == 1
        assert feats[2]["sniffed_mime"] == "image/bmp" and feats[2]["decoded"] == "ok"
        assert feats[3]["sniffed_mime"] == "audio/wav"
        assert feats[3]["decoded"] == "ok"
        # 1600 + 80*(3%4) = 1840 samples at 8 kHz
        assert feats[3]["sample_rate"] == 8000 and feats[3]["duration_s"] == 0.23
        assert feats[3]["rms"] is not None and 0.1 < feats[3]["rms"] < 0.3
        assert feats[4]["sniffed_mime"] == "image/jpeg"
        assert feats[4]["decoded"] == "unsupported"  # SOF2 progressive
        # i%16==10: REAL baseline JPEG decoded by the spec-derived codec
        assert feats[10]["sniffed_mime"] == "image/jpeg"
        assert feats[10]["decoded"] == "ok"
        assert feats[10]["width"] == 16 and feats[10]["ahash"] is not None
        assert feats[6]["decoded"] == "corrupt" and feats[6]["width"] is None
        assert feats[7]["decoded"] == "empty" and feats[7]["n_bytes"] == 0

    def test_decoded_features_match_source_arrays(self, spark):
        """The generator's source arrays and Spark's decoded features
        agree bit-for-bit (lossless codecs + shared feature fns)."""
        import numpy as np

        from atra_spark.functions.media_codecs import ahash64, mean_luma, to_signed64

        media = multimodal.synth_media(spark, n=16, seed=7)
        feats = {r["media_id"]: r for r in multimodal.extract_media_features(media).collect()}
        # regenerate slot-0 source array exactly as _synth_payload does
        rng = np.random.RandomState(7 * 1_000_003 + 8)
        arr = rng.randint(0, 256, size=(16 + 8 % 5, 16, 3), dtype=np.uint8).astype(np.uint8)
        assert feats[8]["ahash"] == to_signed64(ahash64(arr))
        assert feats[8]["mean_luma"] == mean_luma(arr)
        assert (feats[8]["height"], feats[8]["width"]) == arr.shape[:2]

    def test_extracted_features_equal_constructive_goldens(self, spark):
        """Single source of truth for the driver oracle: the feature
        rows the Spark pass produces are EXACTLY the golden rows the
        generator computes by construction (it never runs a decoder) —
        every column, floats bit-identical."""
        media_rows, golden_rows = multimodal.synth_media_with_golden(n=64, seed=11)
        media = spark.createDataFrame(media_rows, multimodal.MEDIA_SCHEMA)
        got = {
            r["media_id"]: r.asDict()
            for r in multimodal.extract_media_features(media).collect()
        }
        assert len(got) == len(golden_rows) == 64
        for g in golden_rows:
            assert got[g["media_id"]] == g, f"mismatch at media_id={g['media_id']}"

    def test_media_resize_matches_goldens(self, spark):
        """Thumbnail pass == goldens computed from the source arrays
        (resize + PNG re-encode + perceptual hash, never via decoders)."""
        media = multimodal.synth_media(spark, n=64, seed=11)
        golden = {g["media_id"]: g for g in
                  multimodal.synth_media_derived_goldens(64, 11, max_dim=8)[0]}
        got = {r["media_id"]: r.asDict()
               for r in multimodal.media_resize(media, max_dim=8).collect()}
        assert len(got) == 64
        for mid, row in got.items():
            assert row == {k: golden[mid].get(k) for k in row}, f"media_id={mid}"
        oks = [r for r in got.values() if r["decoded"] == "ok"]
        assert oks and all(max(r["width"], r["height"]) <= 8 for r in oks)
        # the emitted payload is a real PNG of the resized pixels
        from atra_spark.functions.media_codecs import decode_png

        some = next(r for r in oks if r["payload"])
        arr = decode_png(bytes(some["payload"]))
        assert arr.shape[:2] == (some["height"], some["width"])

    def test_media_frame_sample_matches_goldens(self, spark):
        media = multimodal.synth_media(spark, n=64, seed=11)
        golden: dict[int, list] = {}
        for g in multimodal.synth_media_derived_goldens(64, 11, k_frames=3)[1]:
            golden.setdefault(g["media_id"], []).append(g)
        got: dict[int, list] = {}
        for r in multimodal.media_frame_sample(media, k=3).collect():
            got.setdefault(r["media_id"], []).append(r.asDict())
        assert set(got) == set(golden)
        for mid, rows in got.items():
            rows.sort(key=lambda r: (r["frame_index"] is None, r["frame_index"]))
            want = [{k: g.get(k) for k in rows[0]} for g in golden[mid]]
            assert rows == want, f"media_id={mid}"
        # animated rows (i%16==15) yield 3 sampled frames incl. endpoints
        anim = got[15]
        assert [r["frame_index"] for r in anim][0] == 0
        assert anim[-1]["frame_index"] == anim[0]["n_frames"] - 1
        assert anim[-1]["t_offset"] > 0.0
        # audio rows pass through as not_image, one row, null features
        assert got[3] == [{**got[3][0], "decoded": "not_image"}]
        assert got[3][0]["ahash"] is None

    def test_sample_frame_indices(self):
        f = multimodal.sample_frame_indices
        assert f(1, 3) == [0]
        assert f(10, 1) == [0]
        assert f(2, 3) == [0, 1]
        assert f(6, 3) == [0, 2, 5]
        assert f(3, 3) == [0, 1, 2]
        assert f(100, 4) == [0, 33, 66, 99]

    def test_audio_fingerprints_match_goldens(self, spark):
        """Landmark fingerprints == goldens from the source samples
        (lossless 16-bit WAV round trip; decoder never consulted for
        the truth)."""
        media = multimodal.synth_media(spark, n=64, seed=11)
        got = {(r["media_id"], r["fp"])
               for r in multimodal.media_audio_fingerprints(media).collect()}
        want = {(g["media_id"], g["fp"])
                for g in multimodal.synth_audio_fp_goldens(64, 11)}
        assert got == want and got
        # only audio rows fingerprint; images/corrupt/empty emit nothing
        assert all(mid % 8 == 3 for mid, _ in got)

    def test_audio_near_dup_finds_planted_pairs(self, spark):
        media = multimodal.synth_media(spark, n=64, seed=11)
        fps = multimodal.media_audio_fingerprints(media)
        pairs = {(r["media_a"], r["media_b"]): r["n_common"]
                 for r in multimodal.audio_near_dup(fps, min_common=4).collect()}
        # i%16==11 rows are phase-shifted copies of id i-8's melody:
        # different PCM bytes (md5 differs) but identical fingerprints
        for i in (11, 27, 43, 59):
            assert (i - 8, i) in pairs, f"planted audio near-dup ({i-8},{i}) missed"
        payloads = {r["media_id"]: bytes(r["payload"])
                    for r in media.filter("media_id in (3, 11)").collect()}
        assert payloads[3] != payloads[11], "near-dups must differ at byte level"

    def test_audio_near_dup_hot_fp_cap(self, spark):
        """A degenerate corpus where one fingerprint appears everywhere
        must not explode the self-join: the hot fp is dropped (logged)
        and no pair is produced from it."""
        rows = [(i, 7777) for i in range(20)] + [(0, 1), (1, 1)]
        fps = spark.createDataFrame(rows, "media_id long, fp long")
        pairs = multimodal.audio_near_dup(fps, min_common=1, max_fp_docs=10).collect()
        assert {(r["media_a"], r["media_b"]) for r in pairs} == {(0, 1)}

    def test_media_dedup(self, spark):
        media = multimodal.synth_media(spark, n=32)
        groups = multimodal.media_exact_dedup(media).collect()
        dup = [g for g in groups if g["n_dups"] > 1]
        assert dup, "deterministic duplicates must collapse"

    def test_phash_near_dup(self, spark):
        media = multimodal.synth_media(spark, n=48)
        feats = multimodal.extract_media_features(media)
        pairs = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in multimodal.media_phash_near_dup(feats, max_hamming=8).collect()
        }
        # every slot-5 image is a 1-pixel perturbation of the slot-0
        # image five ids earlier -> must be found with small hamming
        for i in range(5, 48, 8):
            assert (i - 5, i) in pairs, f"near-dup pair ({i-5},{i}) missed"
            assert pairs[(i - 5, i)] <= 8
        # exact-duplicate family (i%16==1) collapses at hamming 0
        assert pairs.get((1, 17), 99) == 0

    def test_phash_near_dup_matches_allpairs(self, spark):
        """Banded blocking loses nothing vs brute force (pigeonhole)."""
        media = multimodal.synth_media(spark, n=32)
        feats = multimodal.extract_media_features(media).cache()
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in multimodal.media_phash_near_dup(feats, max_hamming=10).collect()
        }
        sig = [(r["media_id"], r["ahash"]) for r in feats.collect() if r["ahash"] is not None]
        brute = {}
        for i, (ida, ha) in enumerate(sig):
            for idb, hb in sig[i + 1 :]:
                a, b = sorted((ida, idb))
                h = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if h <= 10:
                    brute[(a, b)] = h
        feats.unpersist()
        assert banded == brute


class TestDuplicatePassages:
    def test_shared_passages_found_and_boilerplate_capped(self, spark):
        from atra_spark.functions.textstats import duplicate_passage_pairs

        passage = "the quick brown fox jumps over the lazy dog again and again"
        boiler = "all rights reserved terms of service apply to every page here"
        rows = [
            (1, f"alpha {passage} omega unique-one"),
            (2, f"beta {passage} gamma unique-two"),
            (3, "completely different text with no overlap whatsoever at all beyond"),
        ] + [(100 + i, f"doc{i} {boiler} tail{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        pairs = {
            (r["id_a"], r["id_b"]): r["shared_fps"]
            for r in duplicate_passage_pairs(df, min_shared=1).collect()
        }
        assert (1, 2) in pairs  # the shared passage is detected
        assert not any(3 in p for p in pairs)
        # boilerplate cap: with max_fp_docs below the boilerplate's
        # document frequency, the 10 boilerplate docs pair up with each
        # other only via their shared text — capped away entirely
        capped = duplicate_passage_pairs(df, min_shared=1, max_fp_docs=5)
        got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        assert (1, 2) in got
        assert not any(a >= 100 and b >= 100 for a, b in got)


class TestDecontamination:
    def test_contaminated_train_docs_flagged(self, spark):
        from atra_spark.functions.textstats import decontamination_overlap

        bench = "what is the capital of france answer paris of course indeed"
        rows_eval = [(900, f"benchmark question {bench} end of item")]
        rows_train = [
            (1, f"web page text {bench} copied straight from the benchmark"),
            (2, "clean training document about spark shuffles and parquet files"),
            (3, f"another leak {bench} hidden in boilerplate text here"),
        ]
        train = spark.createDataFrame(rows_train, "doc_id int, text string")
        ev = spark.createDataFrame(rows_eval, "doc_id int, text string")
        hits = {
            r["id"]: r["shared_fps"]
            for r in decontamination_overlap(train, ev, min_shared=1).collect()
        }
        assert set(hits) == {1, 3}
        assert all(v >= 1 for v in hits.values())

    def test_boilerplate_not_contamination(self, spark):
        from atra_spark.functions.textstats import decontamination_overlap

        boiler = "all rights reserved terms of service apply to every page here"
        ev = spark.createDataFrame(
            [(900, f"eval doc {boiler} question text")], "doc_id int, text string"
        )
        train = spark.createDataFrame(
            [(i, f"doc{i} {boiler} tail{i}") for i in range(10)],
            "doc_id int, text string",
        )
        # the boilerplate passage appears in 11 docs > max_fp_docs=5:
        # capped away, so nothing is flagged
        out = decontamination_overlap(train, ev, min_shared=1, max_fp_docs=5)
        assert out.count() == 0


class TestQuantizedEmbeddings:
    """similarity.quantize_embeddings + quantized_cosine_topk:
    reconstruction error bounded by scale/2 per component; the
    asymmetric quantized search agrees with exact search on separated
    vectors; constant vectors quantize to scale 0 without dividing."""

    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_reconstruction_error_bound(self, spark):
        from atra_spark.functions.similarity import quantize_embeddings

        rows = [(i, [((i * 7 + j * 13) % 101) / 25.0 - 2.0 for j in range(16)])
                for i in range(1, 20)]
        df = self._emb(spark, rows)
        out = {r["id"]: r for r in quantize_embeddings(df).collect()}
        for vid, vec in rows:
            r = out[vid]
            for j, x in enumerate(vec):
                recon = r["offset"] + r["codes"][j] * r["scale"]
                assert abs(recon - x) <= r["scale"] / 2 + 1e-12
                assert 0 <= r["codes"][j] <= 255

    def test_constant_vector_scale_zero(self, spark):
        from atra_spark.functions.similarity import quantize_embeddings

        df = self._emb(spark, [(1, [3.5] * 8)])
        r = quantize_embeddings(df).collect()[0]
        assert r["scale"] == 0.0 and set(r["codes"]) == {0} and r["offset"] == 3.5

    def test_topk_matches_exact_on_separated_vectors(self, spark):
        from atra_spark.functions.similarity import (
            cosine_topk,
            quantize_embeddings,
            quantized_cosine_topk,
        )

        query = [1.0, 0.0, 0.0, 0.0]
        rows = [(i, [float((i * 3 + j) % 7 + 1) for j in range(4)])
                for i in range(1, 40)]
        df = self._emb(spark, rows)
        exact = [r["id"] for r in cosine_topk(df, query, k=5).collect()]
        quant = [
            r["id"]
            for r in quantized_cosine_topk(
                quantize_embeddings(df), query, k=5
            ).collect()
        ]
        assert quant == exact


class TestEmbeddingNearDup:
    def test_near_identical_pair_found(self, spark):
        from atra_spark.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(7)
        base = rng.standard_normal(16)
        # positive scaling keeps every hyperplane sign (same bucket by
        # construction — a noisy perturbation may flip a near-zero dot,
        # which is exactly the single-band recall caveat the docstring
        # declares) while exercising the pairing + exact-cosine path
        near = base * 1.01  # cosine = 1
        rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near])]
        for i in range(2, 12):
            rows.append((i, [float(x) for x in rng.standard_normal(16)]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_near_dup_pairs(df, dim=16, threshold=0.9).collect()
        }
        assert (0, 1) in got
        assert got[(0, 1)] > 0.99
        assert all(p == (0, 1) for p in got)  # random vectors never reach 0.9

    def test_hot_bucket_guard_drops_degenerate_cluster(self, spark):
        from atra_spark.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(11)
        v = [float(x) for x in rng.standard_normal(16)]
        # 8 copies of the same direction all land in one bucket (> max_bucket=4)
        rows = [(i, v) for i in range(8)]
        out = embedding_near_dup_pairs(df=spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ), dim=16, threshold=0.5, max_bucket=4)
        assert out.count() == 0

    def test_auto_n_planes_keeps_buckets_under_cap_at_100k(self, spark):
        """The auto-sized default must not collapse recall at scale: on
        a 100k-vector corpus the chosen plane count keeps > 90% of LSH
        buckets under the drop cap (at the old fixed 8 planes nearly
        every bucket would exceed it and be dropped)."""
        import math

        from pyspark.sql import functions as F

        from atra_spark.functions.similarity import add_lsh_bucket

        # dim matches the embeddings fixture: the cell count of k random
        # hyperplanes through the origin in R^d is capped at
        # sum_{i<=d} C(k,i), so in VERY low dim (d=8: ~2k cells for
        # k=12) no plane count can keep 100k vectors under the cap —
        # the guarantee is about realistic embedding dims
        n, dim, max_bucket = 100_000, 64, 64
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.rand(seed=100 + i) - 0.5).cast("float")
                      for i in range(dim)]).alias("embedding"),
        )
        # same formula embedding_near_dup_pairs applies when n_planes=None
        n_planes = max(8, math.ceil(math.log2(n / max_bucket)) + 1)
        assert n_planes > 8
        sizes = [
            r["c"]
            for r in add_lsh_bucket(df, dim, n_planes, seed=42)
            .groupBy("lsh_bucket").agg(F.count("*").alias("c")).collect()
        ]
        under = sum(1 for c in sizes if c <= max_bucket)
        assert under / len(sizes) > 0.9, f"{under}/{len(sizes)} buckets under cap"

    def test_auto_n_planes_small_corpus_keeps_seeded_default(self, spark):
        """At oracle scale the auto default resolves to the same 8
        seeded planes the SQL twin pins, so the hash stays stable."""
        from atra_spark.functions.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(7)
        rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        auto = embedding_near_dup_pairs(df, dim=16, threshold=0.25)
        pinned = embedding_near_dup_pairs(df, dim=16, threshold=0.25, n_planes=8)
        assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, pinned.collect()))


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark):
        from atra_spark.functions.graph import pagerank

        # 4-node graph with a dangling node (3 has no out-edges)
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["pr"] for r in pagerank(df, iterations=5).collect()}

        import numpy as np

        n, d = 4, 0.85
        out = {0: [1, 2], 1: [2, 3], 2: [0]}
        pr = np.full(n, 1 / n)
        for _ in range(5):
            new = np.full(n, (1 - d) / n)
            dang = sum(pr[v] for v in range(n) if v not in out)
            new += d * dang / n
            for s, ds in out.items():
                for t in ds:
                    new[t] += d * pr[s] / len(ds)
            pr = new
        for v in range(n):
            assert abs(got[v] - pr[v]) < 1e-12, (v, got[v], pr[v])
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved

    def test_duplicate_edges_collapse(self, spark):
        from atra_spark.functions.graph import pagerank

        a = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        b = spark.createDataFrame(
            [(0, 1), (0, 1), (1, 0)], "src long, dst long"
        )
        ra = {r["node"]: r["pr"] for r in pagerank(a).collect()}
        rb = {r["node"]: r["pr"] for r in pagerank(b).collect()}
        assert ra == rb


class TestSampling:
    def test_stratified_quota_exact_and_deterministic(self, spark):
        from atra_spark.functions.sample import stratified_sample

        rows = [(i, "en" if i % 3 else "de") for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out1 = stratified_sample(df, "lang", 10, "doc_id").collect()
        out2 = stratified_sample(df, "lang", 10, "doc_id").collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        by_lang = {}
        for r in out1:
            by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
        assert len(by_lang["en"]) == 10 and len(by_lang["de"]) == 10

    def test_small_stratum_kept_whole(self, spark):
        from atra_spark.functions.sample import stratified_sample

        df = spark.createDataFrame(
            [(1, "xx"), (2, "xx"), (3, "yy")], "doc_id long, lang string"
        )
        out = stratified_sample(df, "lang", 10, "doc_id").collect()
        assert len(out) == 3

    def test_hash_sample_nested_fractions(self, spark):
        from atra_spark.functions.sample import hash_sample

        df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
        small = {r["doc_id"] for r in hash_sample(df, 0.1, "doc_id").collect()}
        big = {r["doc_id"] for r in hash_sample(df, 0.3, "doc_id").collect()}
        assert small <= big  # same key always lands the same side
        assert 0.05 < len(small) / 1000 < 0.2
        assert 0.2 < len(big) / 1000 < 0.4


class TestBigramLmScore:
    def test_gibberish_scores_below_normal_text(self, spark):
        from atra_spark.functions.textstats import bigram_lm_score

        normal = "the quick brown fox jumps over the lazy dog and runs away"
        rows = [(i, normal) for i in range(8)]
        rows.append((100, "zxq vvk qqj plw mmx rrt yyb nnc hhd kkf"))  # gibberish
        rows.append((200, "one"))  # single token: no bigrams -> absent
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["id"]: r["lm_logprob"] for r in bigram_lm_score(df).collect()}
        assert 200 not in got
        normal_scores = [got[i] for i in range(8)]
        assert got[100] < min(normal_scores) - 1.0  # clear outlier margin

    def test_matches_pure_python(self, spark):
        import math

        from atra_spark.functions.textstats import bigram_lm_score

        rows = [(0, "a b a b c"), (1, "c c a"), (2, "b a b")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["id"]: r["lm_logprob"] for r in bigram_lm_score(df).collect()}

        toks = {i: t.split() for i, t in rows}
        pairs = [(i, (ts[j], ts[j + 1])) for i, ts in toks.items() for j in range(len(ts) - 1)]
        from collections import Counter
        bc = Counter(p for _, p in pairs)
        pc = Counter(p[0] for _, p in pairs)
        V = len({t for ts in toks.values() for t in ts})
        k = 0.5
        for i in toks:
            lps = [math.log((bc[p] + k) / (pc[p[0]] + k * V))
                   for (d, p) in pairs if d == i]
            assert abs(got[i] - sum(lps) / len(lps)) < 1e-12, i


class TestMaterializeCorpus:
    def test_each_stage_drops_its_target(self, spark):
        from atra_spark.functions.pipeline import materialize_corpus

        good = ("word%d " * 40) % tuple(range(40))
        bench = "what is the capital of france the answer is paris indeed here"
        rows = [
            (1, good + "original"),
            (2, good + "original"),            # exact dup of 1 -> dropped
            (3, "short text"),                 # < 30 tokens -> dropped
            (4, good + "x " + bench + " y z"), # contaminated -> dropped
            (5, good + "clean survivor"),
        ]
        train = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame(
            [(900, "benchmark item " + bench + " end")], "doc_id long, text string"
        )
        kept = {r["doc_id"] for r in materialize_corpus(
            train, ev, decontam_min_shared=1
        ).collect()}
        assert kept == {1, 5}

    def test_no_eval_skips_decontamination(self, spark):
        from atra_spark.functions.pipeline import materialize_corpus

        good = ("tok%d " * 40) % tuple(range(40))
        train = spark.createDataFrame([(1, good)], "doc_id long, text string")
        assert materialize_corpus(train).count() == 1


class TestHits:
    def test_matches_numpy_iteration(self, spark):
        from atra_spark.functions.graph import hits

        edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=5).collect()}

        import numpy as np

        nodes = sorted({x for e in edges for x in e})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        for s, d in edges:
            A[idx[s], idx[d]] = 1.0
        h = np.full(n, 1.0 / n)
        for _ in range(5):
            a = A.T @ h
            a /= a.sum() if a.sum() else 1.0
            h = A @ a
            h /= h.sum() if h.sum() else 1.0
        for v in nodes:
            assert abs(got[v][0] - h[idx[v]]) < 1e-12, ("hub", v)
            assert abs(got[v][1] - a[idx[v]]) < 1e-12, ("auth", v)
        # node 2 receives from 3 distinct hubs: the top authority
        assert got[2][1] == max(x[1] for x in got.values())


# ---------------------------------------------------------------------------
# round-4 additions: chunk dedup, BM25 retrieval, sessionization, DSIR
# ---------------------------------------------------------------------------
from atra_spark.functions import retrieval, sessions  # noqa: E402


class TestChunkDedup:
    def test_cross_doc_repeated_chunk_removed_once(self, spark):
        a = "a b c d e f g h i j"            # chunks(5): [a..e], [f..j]
        b = "a b c d e x y z w v"            # chunk0 duplicates doc1's chunk0
        df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
        out = {r["doc_id"]: r for r in dedup.chunk_dedup(df, chunk_tokens=5).collect()}
        assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
        assert out[1]["dedup_text"] == a
        assert out[2]["n_kept"] == 1 and out[2]["dedup_text"] == "x y z w v"

    def test_within_doc_dup_and_order_preserved(self, spark):
        t = "p q r s t p q r s t u v w x y"  # chunks(5): dup, dup, unique
        df = spark.createDataFrame([(7, t)], "doc_id long, text string")
        r = dedup.chunk_dedup(df, chunk_tokens=5).collect()[0]
        assert r["n_chunks"] == 3 and r["n_kept"] == 2
        assert r["dedup_text"] == "p q r s t u v w x y"

    def test_short_tail_chunk_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "f g")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in dedup.chunk_dedup(df, chunk_tokens=5).collect()}
        # doc1's tail chunk "f g" wins (lower doc id); doc2 loses its only chunk
        assert out[1]["dedup_text"] == "a b c d e f g"
        assert out[2]["n_kept"] == 0 and out[2]["dedup_text"] == ""


class TestBM25:
    DOCS = [
        (0, "spark spark spark filler filler filler"),
        (1, "spark filler filler filler filler filler"),
        (2, "filler filler filler filler filler filler"),
        (3, "rare filler filler filler filler filler"),
    ]

    def test_tf_ranking_and_rare_term_idf(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        top = retrieval.bm25_topk(df, ["spark"], k=2).collect()
        assert [r["doc_id"] for r in top] == [0, 1]
        both = {
            r["doc_id"]: r["score"]
            for r in retrieval.bm25_topk(df, ["rare", "spark"], k=4).collect()
        }
        # equal tf, equal dl: the rarer term (df=1) must outscore (df=2)
        assert both[3] > both[1]
        assert 2 not in both  # no query term -> no row

    def test_matches_pure_python(self, spark):
        import math

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r["score"] for r in retrieval.bm25_topk(df, ["spark"], k=10).collect()}
        toks = {i: t.split() for i, t in self.DOCS}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        dfreq = sum(1 for v in toks.values() if "spark" in v)
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for i, v in toks.items():
            tf = v.count("spark")
            if not tf:
                assert i not in got
                continue
            exp = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
            assert got[i] == pytest.approx(exp, rel=1e-12)


class TestSessionize:
    def test_gap_boundary_merges_inclusive(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, 10, 1.0),
            (2, base + dt.timedelta(minutes=29), 10, 2.0),  # merges: 29 < 30
            # exactly +30 after prev: STILL merges (Spark's UpdatingSessions
            # bound is inclusive: next_start <= current_end)
            (3, base + dt.timedelta(minutes=59), 10, 4.0),
            # +30min 1s after prev: strictly past the bound -> new session
            (4, base + dt.timedelta(minutes=89, seconds=1), 10, 16.0),
            (5, base + dt.timedelta(minutes=100), 20, 8.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, value double"
        )
        out = sessions.sessionize(df, gap="30 minutes").collect()
        u10 = sorted(
            (r for r in out if r["user_id"] == 10), key=lambda r: r["session_start"]
        )
        assert len(u10) == 2
        assert u10[0]["n_events"] == 3 and u10[0]["sum_value"] == pytest.approx(7.0)
        assert u10[0]["session_start"].startswith("2024-01-01 00:00:00")
        assert u10[0]["session_end_ts"].startswith("2024-01-01 00:59:00")
        assert u10[1]["n_events"] == 1 and u10[1]["sum_value"] == pytest.approx(16.0)
        assert len([r for r in out if r["user_id"] == 20]) == 1


class TestDSIRWeights:
    def test_target_vocab_scores_above_raw_vocab(self, spark):
        # zebra/delta chosen to NOT bucket-collide with alpha/beta under
        # md5 % 64 (alpha=59, beta=43, zebra=24, delta=17)
        rows = (
            [(i, "alpha beta alpha beta", "en") for i in range(10)]
            + [(100 + i, "zebra delta zebra delta", "xx") for i in range(10)]
            + [(200, "alpha beta alpha beta", "xx"), (201, "zebra delta zebra delta", "yy")]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        w = {
            r["doc_id"]: r["dsir_logweight"]
            for r in textstats.dsir_logweight(df).collect()
        }
        # target-typical doc gets a strictly higher importance weight
        assert w[200] > w[201]
        assert w[200] > 0 > w[201]


class TestSourceQualityRollup:
    def test_rollup_values(self, spark):
        rows = [
            (0, "one two three", "en", "good"),
            (1, " ".join(["tok"] * 50), "de", "good"),
            (2, "short", "en", "bad"),
            (3, "also short", "en", "bad"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
        out = {r["source"]: r for r in textstats.source_quality_rollup(df, low_tokens=4).collect()}
        assert out["good"]["n_docs"] == 2 and out["good"]["n_langs"] == 2
        assert out["good"]["avg_tokens"] == pytest.approx((3 + 50) / 2)
        assert out["good"]["low_quality_share"] == pytest.approx(0.5)
        assert out["bad"]["low_quality_share"] == pytest.approx(1.0)


class TestHostGraph:
    EDGES = [
        ("https://a.example/1", "https://b.example/x"),
        ("https://a.example/2", "https://b.example/y"),   # same host pair: weight 2
        ("https://a.example/3", "https://A.EXAMPLE/nav"), # self-loop after lowering: dropped
        ("https://b.example/1", "https://c.example/z"),
        ("nonsense-not-a-url", "https://c.example/z"),    # unparseable src: dropped
    ]

    def test_collapse_weights_and_self_loops(self, spark):
        from atra_spark.functions.graph import host_graph

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_graph(df).collect()
        }
        assert got == {
            ("a.example", "b.example"): 2,
            ("b.example", "c.example"): 1,
        }

    def test_host_pagerank_matches_url_pagerank_on_host_ids(self, spark):
        from atra_spark.functions.graph import host_graph, host_pagerank, pagerank

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        hp = {r["node"]: r["pr"] for r in host_pagerank(df, iterations=3).collect()}
        # equivalent hand-collapsed unweighted graph
        ref_edges = spark.createDataFrame(
            [("a.example", "b.example"), ("b.example", "c.example")],
            "src string, dst string",
        )
        ref = {r["node"]: r["pr"] for r in pagerank(ref_edges, iterations=3).collect()}
        assert hp.keys() == ref.keys()
        for k in ref:
            assert hp[k] == pytest.approx(ref[k], rel=1e-12)
        # sink ranks highest, then the relay, then the pure source
        assert hp["c.example"] > hp["b.example"] > hp["a.example"]


class TestWindowRollupAndPercentiles:
    def test_tumbling_rollup(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base + dt.timedelta(minutes=5), 1, "a", 1.0),
            (2, base + dt.timedelta(minutes=55), 1, "a", 2.0),
            (3, base + dt.timedelta(minutes=65), 1, "a", 4.0),   # next hour bucket
            (4, base + dt.timedelta(minutes=10), 1, "b", 8.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
        )
        from atra_spark.functions.sessions import window_rollup

        got = {
            (r["window_start"][:13], r["key"]): (r["n_events"], r["sum_value"])
            for r in window_rollup(df).collect()
        }
        assert got[("2024-01-01 00", "a")] == (2, 3.0)
        assert got[("2024-01-01 01", "a")] == (1, 4.0)
        assert got[("2024-01-01 00", "b")] == (1, 8.0)

    def test_exact_percentiles_match_numpy(self, spark):
        import numpy as np

        vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]]
        df = spark.createDataFrame(
            [(i, "t", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        from atra_spark.functions.sessions import value_percentiles

        r = value_percentiles(df).collect()[0]
        for col, q in (("p50", 50), ("p95", 95), ("p99", 99)):
            assert r[col] == pytest.approx(
                float(np.percentile(vals, q, method="linear")), rel=1e-12
            )


class TestIncrementalIngest:
    """Cross-batch persistent dedup: the corpus fingerprint table must
    carry membership across ingest calls, store reopens, and
    compaction."""

    @staticmethod
    def _doc(seed):
        # 36 tokens, space ratio ~0.17: passes the default quality gates
        return " ".join(f"w{seed}x{j}" for j in range(36))

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cross_batch_dedup_and_provenance(self, spark, tmp_path):
        from atra_spark.functions.pipeline import incremental_ingest
        from atra_spark.sources.store import CheckpointStore

        store = CheckpointStore(str(tmp_path / "s"), num_buckets=4)
        ta, tb, tc = self._doc("a"), self._doc("b"), self._doc("c")
        b1 = self._df(spark, [(1, ta), (2, tb)])
        got1 = {r["doc_id"] for r in incremental_ingest(spark, store, b1, 1).collect()}
        assert got1 == {1, 2}
        # batch 2: doc3 duplicates ta (cross-batch), doc4/doc5 in-batch dups
        b2 = self._df(spark, [(3, ta), (4, tc), (5, tc)])
        got2 = {r["doc_id"] for r in incremental_ingest(spark, store, b2, 2).collect()}
        assert got2 == {4}
        fps = store.read_snapshot(spark, "corpus_fp").collect()
        assert len(fps) == 3
        by_doc = {r["doc_id"]: r["first_round"] for r in fps}
        assert by_doc == {1: 1, 2: 1, 4: 2}

    def test_membership_survives_reopen(self, spark, tmp_path):
        from atra_spark.functions.pipeline import incremental_ingest
        from atra_spark.sources.store import CheckpointStore

        root = str(tmp_path / "s")
        ta = self._doc("a")
        incremental_ingest(
            spark, CheckpointStore(root, num_buckets=4),
            self._df(spark, [(1, ta)]), 1,
        )
        # NEW store object on the same root (process restart analog)
        got = incremental_ingest(
            spark, CheckpointStore(root, num_buckets=4),
            self._df(spark, [(2, ta), (3, self._doc("b"))]), 2,
        ).collect()
        assert {r["doc_id"] for r in got} == {3}

    def test_compaction_preserves_membership(self, spark, tmp_path):
        from atra_spark.functions.pipeline import incremental_ingest
        from atra_spark.sources.store import CheckpointStore

        store = CheckpointStore(str(tmp_path / "s"), num_buckets=4)
        for rnd, seed in ((1, "a"), (2, "b")):
            incremental_ingest(
                spark, store, self._df(spark, [(rnd, self._doc(seed))]),
                rnd, compact_every=2,
            )
        snaps = store._load_manifest("corpus_fp")["snapshots"]
        assert any(s.get("kind") != "delta" and s["round"] == 2 for s in snaps), \
            "compact_every=2 must burn a base at round 2"
        # membership intact after compaction
        got = incremental_ingest(
            spark, store,
            self._df(spark, [(10, self._doc("a")), (11, self._doc("z"))]),
            3, compact_every=99,
        ).collect()
        assert {r["doc_id"] for r in got} == {11}


class TestWeightedPageRank:
    def test_matches_numpy_weighted_iteration(self, spark):
        edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 2.0)]
        df = spark.createDataFrame(edges, "src long, dst long, weight double")
        from atra_spark.functions.graph import weighted_pagerank

        got = {r["node"]: r["pr"] for r in weighted_pagerank(df, iterations=4).collect()}

        nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        wsum = {}
        for s, _, w in edges:
            wsum[s] = wsum.get(s, 0.0) + w
        pr = np.full(n, 1.0 / n)
        d = 0.85
        for _ in range(4):
            new = np.full(n, (1 - d) / n)
            dang = sum(pr[idx[v]] for v in nodes if v not in wsum)
            for s, t, w in edges:
                new[idx[t]] += d * pr[idx[s]] * w / wsum[s]
            new += d * dang / n
            pr = new
        for v in nodes:
            assert got[v] == pytest.approx(pr[idx[v]], rel=1e-9), v

    def test_duplicate_edges_sum_weights(self, spark):
        from atra_spark.functions.graph import weighted_pagerank

        a = spark.createDataFrame(
            [(0, 1, 1.0), (0, 1, 2.0), (0, 2, 1.0)], "src long, dst long, weight double"
        )
        b = spark.createDataFrame(
            [(0, 1, 3.0), (0, 2, 1.0)], "src long, dst long, weight double"
        )
        ra = {r["node"]: r["pr"] for r in weighted_pagerank(a, iterations=3).collect()}
        rb = {r["node"]: r["pr"] for r in weighted_pagerank(b, iterations=3).collect()}
        for k in rb:
            assert ra[k] == pytest.approx(rb[k], rel=1e-12)


class TestPmiAndZipf:
    DOCS = [(i, "hot dog hot dog cold cat " + f"u{i}") for i in range(6)]

    def test_pmi_favors_exclusive_pair(self, spark):
        from atra_spark.functions.textstats import bigram_pmi

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        rows = bigram_pmi(df, min_count=5, top_k=10).collect()
        got = {(r["prev"], r["cur"]): r for r in rows}
        # "cold cat" is a deterministic 1:1 collocation (cold only ever
        # precedes cat); "dog hot" happens between repetitions too
        assert ("cold", "cat") in got
        assert got[("cold", "cat")]["pmi"] > got[("hot", "dog")]["pmi"] - 1e-9
        # min_count: the unique trailing u{i} tokens never appear
        assert all(not p[1].startswith("u") for p in got)

    def test_pmi_matches_pure_python(self, spark):
        import math

        from atra_spark.functions.textstats import bigram_pmi

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {(r["prev"], r["cur"]): r["pmi"] for r in bigram_pmi(df, min_count=2).collect()}
        toks = {i: t.split() for i, t in self.DOCS}
        uni: dict = {}
        big: dict = {}
        for v in toks.values():
            for t in v:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(v, v[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        T = sum(uni.values())
        B = sum(big.values())
        for k, c in big.items():
            if c >= 2:
                exp = math.log((c / B) / ((uni[k[0]] / T) * (uni[k[1]] / T)))
                assert got[k] == pytest.approx(exp, rel=1e-12), k

    def test_zipf_rank_order(self, spark):
        from atra_spark.functions.textstats import zipf_table

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        rows = zipf_table(df, top_k=4).collect()
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        assert rows[0]["term"] in ("hot", "dog") and rows[0]["freq"] == 12
        freqs = [r["freq"] for r in rows]
        assert freqs == sorted(freqs, reverse=True)


class TestReviewRegressions:
    """Pins for defects caught in the round-4 self-review."""

    def test_dsir_null_lang_counts_as_raw(self, spark):
        from atra_spark.functions.textstats import dsir_logweight

        rows = (
            [(i, "alpha beta", "en") for i in range(5)]
            + [(100, "alpha beta", None), (101, "zebra delta", None)]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        w = {r["doc_id"]: r["dsir_logweight"] for r in dsir_logweight(df).collect()}
        # NULL-lang docs are raw-only; their tokens' llr must be REAL
        # numbers, not NULL-poisoned (both docs present, ordered)
        assert 100 in w and 101 in w
        assert w[100] is not None and w[101] is not None
        assert w[100] > w[101]

    def test_incremental_ingest_compaction_cadence(self, spark, tmp_path):
        """After the FIRST compaction, stale deltas below the base must
        not re-trigger compaction on every subsequent batch."""
        from atra_spark.functions.pipeline import incremental_ingest
        from atra_spark.sources.store import CheckpointStore

        store = CheckpointStore(str(tmp_path / "s"), num_buckets=4)
        for rnd, seed in ((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")):
            doc = " ".join(f"w{seed}{j}" for j in range(36))
            incremental_ingest(
                spark, store,
                spark.createDataFrame([(rnd, doc)], "doc_id long, text string"),
                rnd, compact_every=2,
            )
        snaps = store._load_manifest("corpus_fp")["snapshots"]
        base_rounds = sorted(s["round"] for s in snaps if s.get("kind") != "delta")
        # cadence: bases at rounds 2 and 4 only — NOT at 3 and 5
        assert base_rounds == [2, 4], snaps
        # membership still exact across the whole history
        fps = store.read_snapshot(spark, "corpus_fp").collect()
        assert sorted(r["doc_id"] for r in fps) == [1, 2, 3, 4, 5]


class TestRecrawlPriority:
    def test_cadence_and_staleness(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # key 1: hourly cadence, last seen 5h before corpus max -> staleness 5
        for i in range(4):
            rows.append((len(rows), base + dt.timedelta(hours=i), 1, 0.0))
        # key 2: daily cadence, last seen 1 day before corpus max -> staleness 1
        for i in range(3):
            rows.append((len(rows), base + dt.timedelta(days=i + 1), 2, 0.0))
        # corpus max = key 2's last event (day 3 = hour 72); key 1 last at hour 3
        # key 3: single event -> excluded
        rows.append((len(rows), base, 3, 0.0))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, value double"
        )
        from atra_spark.functions.sessions import recrawl_priority

        got = {r["key"]: r for r in recrawl_priority(df).collect()}
        assert set(got) == {1, 2}
        assert got[1]["avg_gap_s"] == pytest.approx(3600.0)
        assert got[1]["staleness"] == pytest.approx((72 - 3) * 3600 / 3600.0)  # 69 gaps stale
        assert got[2]["avg_gap_s"] == pytest.approx(86400.0)
        assert got[2]["staleness"] == pytest.approx(0.0)
        # the hourly key far outranks the daily key
        assert got[1]["staleness"] > got[2]["staleness"]


class TestShardPack:
    def test_matches_python_prefix_sum(self, spark):
        rows = [(i, (i * 37) % 900 + 100) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, nbytes long")
        got = {
            r["doc_id"]: (r["shard_id"], r["offset_in_shard"], r["size"])
            for r in multimodal.shard_pack(
                df, size_col="nbytes", shard_bytes=1000
            ).collect()
        }
        cum = 0
        for i, nb in rows:
            assert got[i] == (cum // 1000, cum % 1000, nb), i
            cum += nb

    def test_invariant_under_input_partitioning(self, spark):
        rows = [(i, 300) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, nbytes long")
        a = sorted(map(tuple, multimodal.shard_pack(df, "nbytes", 1000).collect()))
        b = sorted(map(tuple, multimodal.shard_pack(df.repartition(7), "nbytes", 1000).collect()))
        c = sorted(map(tuple, multimodal.shard_pack(df.coalesce(1), "nbytes", 1000).collect()))
        assert a == b == c

    def test_items_never_split_and_order_preserved(self, spark):
        df = spark.createDataFrame([(1, 700), (2, 700), (3, 700)], "doc_id long, nbytes long")
        got = {r["doc_id"]: r for r in multimodal.shard_pack(df, "nbytes", 1000).collect()}
        # item 2 STARTS in shard 0 (offset 700) even though it straddles
        assert (got[1]["shard_id"], got[1]["offset_in_shard"]) == (0, 0)
        assert (got[2]["shard_id"], got[2]["offset_in_shard"]) == (0, 700)
        assert (got[3]["shard_id"], got[3]["offset_in_shard"]) == (1, 400)


class TestPackSequences:
    @staticmethod
    def _serial(rows, b):
        """Reference concat-and-chunk: walk the token stream serially."""
        out, pos = [], 0
        for doc_id, n in rows:
            if n <= 0:
                continue
            start, end = pos, pos + n
            blk = start // b
            while blk * b < end:
                s = max(start, blk * b)
                e = min(end, (blk + 1) * b)
                out.append((doc_id, blk, s - blk * b, s - start, e - s))
                blk += 1
            pos = end
        return sorted(out)

    def test_matches_serial_packing(self, spark):
        # sizes cross boundaries, exceed a block, and include zeros
        rows = [(i, (i * 137) % 700) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = sorted(
            (r["doc_id"], r["block_id"], r["block_offset"], r["doc_offset"], r["seg_len"])
            for r in multimodal.pack_sequences(
                df, size_col="n_tokens", block_tokens=512
            ).collect()
        )
        assert got == self._serial(rows, 512)

    def test_invariant_under_input_partitioning(self, spark):
        rows = [(i, 300 + (i % 5) * 111) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        a = sorted(map(tuple, multimodal.pack_sequences(df, "n_tokens", 512).collect()))
        b = sorted(
            map(tuple, multimodal.pack_sequences(df.repartition(7), "n_tokens", 512).collect())
        )
        c = sorted(
            map(tuple, multimodal.pack_sequences(df.coalesce(1), "n_tokens", 512).collect())
        )
        assert a == b == c

    def test_blocks_tile_exactly(self, spark):
        """Every block but the last is exactly full, segments tile it
        contiguously from offset 0, and per-doc segments cover the doc."""
        rows = [(i, 100 + (i * 61) % 400) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        segs = multimodal.pack_sequences(df, "n_tokens", 256).collect()
        total = sum(n for _, n in rows)
        by_block = {}
        for r in segs:
            by_block.setdefault(r["block_id"], []).append(r)
        assert set(by_block) == set(range((total + 255) // 256))
        for blk, rs in by_block.items():
            rs.sort(key=lambda r: r["block_offset"])
            pos = 0
            for r in rs:
                assert r["block_offset"] == pos
                pos += r["seg_len"]
            assert pos == (256 if blk < max(by_block) else total - 256 * blk)
        by_doc = {}
        for r in segs:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, n in rows:
            rs = sorted(by_doc[doc_id], key=lambda r: r["doc_offset"])
            assert rs[0]["doc_offset"] == 0
            assert sum(r["seg_len"] for r in rs) == n

    def test_zero_length_docs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 0), (3, 10)], "doc_id long, n_tokens long"
        )
        got = multimodal.pack_sequences(df, "n_tokens", 16).collect()
        assert {r["doc_id"] for r in got} == {1, 3}
        # doc 3 starts right after doc 1 — the zero doc holds no positions
        d3 = next(r for r in got if r["doc_id"] == 3)
        assert (d3["block_id"], d3["block_offset"]) == (0, 10)


class TestQualityDecilesAndBudget:
    def test_deciles_equal_population_and_order(self, spark):
        from atra_spark.functions.textstats import quality_deciles

        df = spark.createDataFrame(
            [(i, float(100 - i)) for i in range(20)], "id long, q double"
        )
        got = {r["id"]: r["decile"] for r in quality_deciles(df, "q", "id").collect()}
        # descending score: ids 0,1 (highest q) -> decile 1; ids 18,19 -> 10
        assert got[0] == got[1] == 1
        assert got[18] == got[19] == 10
        assert sorted(got.values()) == sorted([d for d in range(1, 11) for _ in range(2)])

    def test_budget_selection_matches_python(self, spark):
        from atra_spark.functions.textstats import select_token_budget

        rows = [(i, float((i * 13) % 50), (i * 7) % 90 + 10) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, q double, ntok long")
        got = {r["id"]: r["cum_tokens"] for r in select_token_budget(
            df, budget_tokens=800, score_col="q", tokens_col="ntok", id_col="id"
        ).collect()}
        cum = 0
        expected = {}
        for i, q, n in sorted(rows, key=lambda r: (-r[1], r[0])):
            if cum < 800:
                expected[i] = cum + n
            cum += n
        assert got == expected

    def test_budget_invariant_under_partitioning(self, spark):
        from atra_spark.functions.textstats import select_token_budget

        rows = [(i, float(i % 7), 50) for i in range(30)]
        df = spark.createDataFrame(rows, "id long, q double, ntok long")
        a = sorted(map(tuple, select_token_budget(df, 500, "q", "ntok", "id").collect()))
        b = sorted(map(tuple, select_token_budget(df.repartition(9), 500, "q", "ntok", "id").collect()))
        assert a == b and len(a) == 10  # 500/50


class TestMinhashCalibration:
    def test_exact_dup_estimates_one_and_true_matches_python(self, spark, docs_df):
        got = {
            (r["doc_a"], r["doc_b"]): (r["est_j"], r["true_j"])
            for r in dedup.minhash_calibration(docs_df).collect()
        }
        # exact dups (0,2): every signature component matches, true j = 1
        assert got[(0, 2)] == (1.0, 1.0)
        # every candidate's true_j equals the pure-python jaccard at 4dp
        import math

        for (a, b), (_, tj) in got.items():
            want = _jaccard(_shingles(dict(DOCS)[a]), _shingles(dict(DOCS)[b]))
            assert tj == math.floor(want * 10000 + 0.5 + 1e-6) / 10000, (a, b)
        # estimates live in [0, 1] on the 8-hash grid
        assert all(0.0 <= e <= 1.0 and round(e * 8, 6) % 1 == 0 for e, _ in got.values())


class TestKmeans:
    """Lloyd's k-means (similarity.kmeans_assign) vs a straight numpy
    implementation of the same spec: init = k lowest ids, argmin of
    6dp-rounded squared L2 with lowest-cid tie-break, mean update."""

    def _numpy_kmeans(self, vecs: np.ndarray, k: int, n_iter: int):
        ids = np.arange(len(vecs))
        cent = {i: vecs[i].astype(np.float64) for i in range(k)}

        def assign(cent):
            out = {}
            for i in ids:
                best = None
                for cid in sorted(cent):
                    d = float(((vecs[i] - cent[cid]) ** 2).sum())
                    d = np.floor(d * 1e6 + 0.5 + 1e-6) / 1e6
                    if best is None or d < best[1]:
                        best = (cid, d)
                out[i] = best
            return out

        for _ in range(n_iter):
            a = assign(cent)
            cent = {
                cid: vecs[[i for i in ids if a[i][0] == cid]].mean(axis=0)
                for cid in {v[0] for v in a.values()}
            }
        return assign(cent)

    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(7)
        # 3 well-separated blobs + noise so updates genuinely move
        blobs = np.concatenate(
            [rng.randn(20, 6) * 0.3 + c for c in (0.0, 4.0, -4.0)]
        ).astype(np.float64)
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in blobs[i]]) for i in range(len(blobs))],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in similarity.kmeans_assign(df, k=4, n_iter=3).collect()
        }
        want = self._numpy_kmeans(blobs, k=4, n_iter=3)
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], f"vec {i} cluster"
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
        # the separated blobs actually resolve: >1 cluster survives
        assert len({c for c, _ in got.values()}) >= 3

    def test_deterministic_across_partitionings(self, spark):
        rng = np.random.RandomState(11)
        vecs = rng.randn(40, 5)
        rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(40)]
        a = similarity.kmeans_assign(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            k=5, n_iter=2,
        ).collect()
        b = similarity.kmeans_assign(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
            .repartition(7),
            k=5, n_iter=2,
        ).collect()
        key = lambda r: (r["vec_id"], r["cluster"], r["dist"])
        assert sorted(map(key, a)) == sorted(map(key, b))


class TestSemDeDup:
    """similarity.semdedup vs a serial numpy reference of the same
    spec: kmeans blocking, within-cluster pairwise 6dp-rounded cosine,
    keep-first-by-id election at the threshold."""

    @staticmethod
    def _serial(vecs: np.ndarray, clusters: dict[int, int], thr: float):
        norms = np.sqrt((vecs ** 2).sum(axis=1))
        keep = {}
        for j in range(len(vecs)):
            pruned = False
            for i in range(j):
                if clusters[i] != clusters[j]:
                    continue
                cos = float(vecs[i] @ vecs[j]) / (norms[i] * norms[j])
                cos = np.floor(cos * 1e6 + 0.5 + 1e-6) / 1e6
                if cos >= thr:
                    pruned = True
                    break
            keep[j] = not pruned
        return keep

    def test_matches_serial_reference(self, spark):
        rng = np.random.RandomState(3)
        # 3 blobs: tight blobs produce genuine within-cluster near-dups
        blobs = np.concatenate(
            [rng.randn(15, 6) * 0.2 + c for c in (1.0, 5.0, -5.0)]
        ).astype(np.float64)
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in blobs[i]]) for i in range(len(blobs))],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cluster"], r["keep"])
            for r in similarity.semdedup(df, k=3, n_iter=2, threshold=0.9).collect()
        }
        clusters = {i: got[i][0] for i in got}
        want = self._serial(blobs, clusters, 0.9)
        assert {i: k for i, (_, k) in got.items()} == want
        # the tight blobs actually dedup: some rows pruned, some kept
        kept = sum(got[i][1] for i in got)
        assert 0 < kept < len(blobs)
        # every cluster retains at least one representative
        for c in set(clusters.values()):
            assert any(got[i][1] for i in got if got[i][0] == c)

    def test_invariant_under_input_partitioning(self, spark):
        rng = np.random.RandomState(5)
        vecs = rng.randn(30, 4)
        rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(30)]
        a = similarity.semdedup(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            k=3, n_iter=2, threshold=0.5,
        ).collect()
        b = similarity.semdedup(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
            .repartition(7),
            k=3, n_iter=2, threshold=0.5,
        ).collect()
        key = lambda r: (r["vec_id"], r["cluster"], r["keep"])
        assert sorted(map(key, a)) == sorted(map(key, b))


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        from atra_spark.functions.scrub import pii_scrub

        rows = [
            (0, "mail bob.smith@corp.example.com or admin@x.io today"),
            (1, "server 192.168.0.1 and 10.0.0.255 up"),
            (2, "call +49 301 2003456 now"),
            (3, "pay DE89370400440532013000 please"),
            (4, "nothing sensitive here"),
            (5, "999.999.999.999 is not an ip; neither is 1.2.3"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert got[0]["n_email"] == 2 and got[0]["n_pii"] == 2
        assert got[0]["redacted_text"] == "mail <EMAIL> or <EMAIL> today"
        assert got[1]["n_ipv4"] == 2
        assert got[1]["redacted_text"] == "server <IP> and <IP> up"
        assert got[2]["n_phone"] == 1 and "<PHONE>" in got[2]["redacted_text"]
        assert got[3]["n_iban"] == 1 and "<IBAN>" in got[3]["redacted_text"]
        assert got[4]["n_pii"] == 0 and got[4]["redacted_text"] == rows[4][1]
        # octet range guard: 999.x / 3-part dotted sequences never match
        assert got[5]["n_ipv4"] == 0

    def test_all_jvm_no_python_stage(self, spark):
        from atra_spark.functions.scrub import pii_scrub

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


class TestSiteBoilerplate:
    def test_template_removed_content_kept(self, spark):
        from atra_spark.functions.scrub import site_boilerplate_removal

        header = "subscribe to our newsletter"
        rows = [
            (0, "s1", f"{header}\nunique content zero\nrare footer"),
            (1, "s1", f"{header}\nunique content one"),
            (2, "s1", f"{header}\nunique content two"),
            (3, "s1", "no header here at all"),
            # other site shares the header text but only in 1/2 docs
            (4, "s2", f"{header}\nother site text"),
            (5, "s2", "totally different"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["doc_id"]: r
            for r in site_boilerplate_removal(df, min_ratio=0.5, min_docs=2).collect()
        }
        # s1: header in 3/4 docs (>= ceil(0.5*4)=2) -> boilerplate
        assert got[0]["n_boiler"] == 1
        assert got[0]["clean_text"] == "unique content zero\nrare footer"
        assert got[1]["clean_text"] == "unique content one"
        assert got[3]["n_boiler"] == 0
        # s2: header in 1/2 docs < max(min_docs=2, 1) -> kept (per-SITE ratio)
        assert got[4]["n_boiler"] == 0
        assert got[4]["clean_text"] == f"{header}\nother site text"

    def test_line_order_restored(self, spark):
        from atra_spark.functions.scrub import site_boilerplate_removal

        rows = [(i, "s", "\n".join(f"line {i} {j}" for j in range(6))) for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {r["doc_id"]: r for r in site_boilerplate_removal(df).collect()}
        for i, _, text in rows:
            assert got[i]["clean_text"] == text  # nothing shared -> verbatim


class TestNormalizeText:
    def test_nfc_zero_width_control_whitespace(self, spark):
        from atra_spark.functions.scrub import normalize_text

        rows = [
            (0, "café time"),          # decomposed -> composed (1 cp shorter)
            (1, "a​b‌c﻿d"),   # zero-width stripped
            (2, "bell\x07 and\x00null"),     # C0 controls stripped
            (3, "too   many\t\tspaces"),     # runs collapse
            (4, "  edge  "),                 # space-only trim
            (5, "\nkeep newline edges\n"),   # newline is content, not trimmed
            (6, "already clean"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in normalize_text(df).collect()}
        assert got[0]["norm_text"] == "café time" and got[0]["changed"]
        assert got[0]["n_chars_after"] == got[0]["n_chars_before"] - 1
        assert got[1]["norm_text"] == "abcd"
        assert got[2]["norm_text"] == "bell andnull"
        assert got[3]["norm_text"] == "too many spaces"
        assert got[4]["norm_text"] == "edge"
        assert got[5]["norm_text"] == "\nkeep newline edges\n"
        assert not got[6]["changed"]


class TestUrlCanonicalDedup:
    def test_normalization_rules(self, spark):
        from atra_spark.functions.jvm_url import url_canonical_dedup

        rows = [
            ("HTTPS://Ex.COM:443/p?utm_source=a&id=2&b=1#f",),
            ("https://ex.com/p?b=1&id=2",),
            ("https://ex.com/p?id=2&b=1&fbclid=xyz",),
            ("https://ex.com",),
            ("https://ex.com/",),
            ("http://ex.com:80/q",),
            ("https://ex.com/p?SESSIONID=9",),  # case-insensitive param match
        ]
        df = spark.createDataFrame(rows, "url string")
        got = {r["canon_url"]: r for r in url_canonical_dedup(df).collect()}
        grp = got["https://ex.com/p?b=1&id=2"]
        assert grp["n_variants"] == 3 and grp["n_distinct_raw"] == 3
        assert grp["keeper"] == "HTTPS://Ex.COM:443/p?utm_source=a&id=2&b=1#f"
        assert got["https://ex.com/"]["n_variants"] == 2
        assert got["http://ex.com/q"]["n_variants"] == 1
        # sessionid-only query collapses to the bare path
        assert got["https://ex.com/p"]["n_variants"] == 1

    def test_all_jvm(self, spark):
        from atra_spark.functions.jvm_url import normalize_url_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("https://x.example/a?utm_b=1",)], "url string")
        plan = (
            df.select(normalize_url_col(F.col("url")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan


class TestBpe:
    def test_merge_fold_greedy_scan(self, spark):
        """The SQL aggregate fold reproduces the canonical greedy
        left-to-right merge: 'aaa' + (a,a) -> ['aa','a']."""
        from atra_spark.functions.bpe import _apply_merge

        df = spark.createDataFrame(
            [(["a", "a", "a"], 1), (["a", "a", "a", "a"], 1), (["b", "a", "a"], 1)],
            "symbols array<string>, freq long",
        )
        got = {tuple(r["symbols"]) for r in _apply_merge(df, "a", "a").collect()}
        assert got == {("aa", "a"), ("aa", "aa"), ("b", "aa")}

    def test_spark_training_equals_serial_reference(self, spark):
        from atra_spark.functions import bpe

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the lazy dog sleeps while the quick fox runs",
            "lower lowest newer newest wider widest",
            "hugging tugging jogging logging",
        ] * 3
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        m_spark = bpe.bpe_train(docs, n_merges=25, min_pair_freq=2)
        m_serial = bpe.bpe_train_serial(texts, n_merges=25, min_pair_freq=2)
        assert m_spark == m_serial
        assert m_spark, "corpus has mergeable pairs"
        # ranks strictly ordered, frequencies non-increasing is NOT
        # guaranteed by BPE (merges create new pairs), but ranks are
        assert [m[0] for m in m_spark] == list(range(len(m_spark)))

    def test_encode_counts_match_serial(self, spark):
        import re

        from atra_spark.functions import bpe

        texts = ["endings matter: running runner ran", "runner running rans"] * 4
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = bpe.bpe_train(docs, n_merges=15)
        got = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe.bpe_encode_counts(docs, merges).collect()}
        ranks = {(l, r): k for k, l, r, _ in merges}
        split = re.compile(bpe._WORD_SPLIT)
        for i, t in enumerate(texts):
            want = sum(len(bpe.encode_word(w, ranks))
                       for w in split.split(t.lower()) if w)
            assert got[i] == want

    def test_encode_word_edge_cases(self):
        from atra_spark.functions.bpe import encode_word

        assert encode_word("", {}) == []
        assert encode_word("a", {}) == ["a</w>"]
        assert encode_word("ab", {}) == ["a", "b</w>"]
        assert encode_word("ab", {("a", "b</w>"): 0}) == ["ab</w>"]
        # best-rank-first, not left-first: (b,c</w>) rank 0 wins over (a,b) rank 1
        assert encode_word("abc", {("b", "c</w>"): 0, ("a", "b"): 1}) == ["a", "bc</w>"]

    def test_word_cap_is_logged_not_silent(self, spark, caplog):
        import logging

        from atra_spark.functions.bpe import word_freqs

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        with caplog.at_level(logging.WARNING, logger="atra_spark.functions.bpe"):
            kept = word_freqs(docs, max_words=3)
            assert kept.count() == 3
        assert any("cap" in r.message for r in caplog.records)


class TestBpeBatch:
    def test_batch_fold_equals_sequential_single_merges(self, spark):
        """One map-lookup scan over symbol-disjoint pairs == applying
        each pair's single-merge fold in sequence."""
        from atra_spark.functions.bpe import _apply_merge, _apply_merge_batch

        rows = [
            (["a", "b", "c", "d", "a", "b"], 3),
            (["c", "d", "c", "d", "x</w>"], 2),
            (["a", "a", "b", "b"], 1),
        ]
        df = spark.createDataFrame(rows, "symbols array<string>, freq long")
        pairs = [("a", "b"), ("c", "d")]
        batch = {tuple(r["symbols"]): r["freq"]
                 for r in _apply_merge_batch(df, pairs).collect()}
        seq = df
        for l, r in pairs:
            seq = _apply_merge(seq, l, r)
        sequential = {tuple(r["symbols"]): r["freq"] for r in seq.collect()}
        assert batch == sequential
        assert ("ab", "cd", "ab") in batch

    def test_batch_training_equals_serial_on_disjoint_corpus(self, spark):
        """Corpus of 2-letter words over pairwise-disjoint alphabets:
        every merge collapses a whole word (creates no new pairs), so
        batch rounds are byte-identical to the one-merge-at-a-time
        serial reference."""
        from atra_spark.functions import bpe

        alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
        words = [alphabet[i] + alphabet[i + 1] for i in range(0, 36, 2)]
        # strictly decreasing frequencies -> unambiguous global order
        texts = [" ".join([w] * (100 - 3 * k)) for k, w in enumerate(words)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got, rounds = bpe.bpe_train_batch(docs, n_merges=18, batch_k=8)
        want = bpe.bpe_train_serial(texts, n_merges=18)
        assert got == want
        assert len(got) == 18
        assert rounds == 3  # ceil(18 / 8): the batching actually batched

    def test_thousand_merges_in_bounded_rounds(self, spark):
        """The scale criterion: a 1,000-merge training run completes in
        <= ~50 Spark rounds (vs 1,000 sequential jobs on the exact
        path), each merge rank recorded with its selection-time count."""
        import random

        from atra_spark.functions import bpe

        rng = random.Random(42)
        alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(8, 12)))
            for _ in range(1500)
        }
        text = " ".join(w for w in sorted(words) for _ in range(3))
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        merges, rounds = bpe.bpe_train_batch(docs, n_merges=1000, batch_k=64)
        assert len(merges) == 1000
        assert rounds <= 50, f"took {rounds} rounds"
        assert [m[0] for m in merges] == list(range(1000))
        # within a round, accepted pairs keep the sorted-count order
        assert all(n >= 2 for _, _, _, n in merges)


class TestBpeVocab:
    def test_vocab_matches_serial_replay(self, spark):
        from atra_spark.functions import bpe

        texts = ["lower lowest newer newest", "low new lower newer"] * 5
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = bpe.bpe_train(docs, n_merges=12)
        got = {r["token"]: r["n_occurrences"]
               for r in bpe.bpe_vocab(docs, merges).collect()}
        want = bpe.bpe_vocab_serial(texts, merges)
        assert got == want
        # every corpus character mass is conserved: sum(len(tok)*n) is
        # invariant under merging (merges concatenate, never drop)
        base = sum(len(w) + 4 for t in texts for w in t.split())  # +4 = '</w>'
        assert sum(len(tok) * n for tok, n in got.items()) == base

    def test_vocab_with_no_merges_is_character_table(self, spark):
        from atra_spark.functions import bpe

        docs = spark.createDataFrame([(0, "ab ba")], "doc_id long, text string")
        got = {r["token"]: r["n_occurrences"]
               for r in bpe.bpe_vocab(docs, []).collect()}
        assert got == {"a": 1, "b": 1, "b</w>": 1, "a</w>": 1}


class TestTemperatureMixing:
    def test_weights_tau_flattens_toward_uniform(self, spark):
        from atra_spark.functions.sample import temperature_mixing_weights

        rows = [(i, "big") for i in range(90)] + [(i + 90, "small") for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id long, source string")
        w1 = {r["source"]: r for r in
              temperature_mixing_weights(docs, tau=1.0).collect()}
        w5 = {r["source"]: r for r in
              temperature_mixing_weights(docs, tau=5.0).collect()}
        # tau=1 keeps the natural mix
        assert abs(w1["big"]["mix_share"] - 0.9) < 1e-9
        assert abs(w1["big"]["upsample_factor"] - 1.0) < 1e-9
        # higher temperature moves shares toward uniform and upweights
        # the rare source, never past uniform
        assert 0.5 < w5["big"]["mix_share"] < 0.9
        assert w5["small"]["mix_share"] > w1["small"]["mix_share"]
        assert w5["small"]["upsample_factor"] > 1.0 > w5["big"]["upsample_factor"]
        # shares always sum to 1 (mod the 1e-6 per-share rounding)
        assert abs(sum(r["mix_share"] for r in w5.values()) - 1.0) < 1e-5


class TestWeightedSample:
    """sample.weighted_sample — Efraimidis–Spirakis A-Res with a
    hash-derived deterministic draw."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, lang string, w double")

    def test_deterministic_across_partitionings(self, spark):
        from atra_spark.functions.sample import weighted_sample

        rows = [(i, "en", 1.0 + (i % 7)) for i in range(300)]
        df = self._df(spark, rows)
        a = sorted(map(tuple, weighted_sample(df.repartition(1), 25, "w").collect()))
        b = sorted(map(tuple, weighted_sample(df.repartition(13), 25, "w").collect()))
        assert a == b and len(a) == 25

    def test_heavy_weight_always_wins(self, spark):
        from atra_spark.functions.sample import weighted_sample

        rows = [(i, "en", 1e-6) for i in range(1, 500)] + [(0, "en", 1e6)]
        out = weighted_sample(self._df(spark, rows), 1, "w").collect()
        assert [r["doc_id"] for r in out] == [0]

    def test_nonpositive_and_null_weights_never_drawn(self, spark):
        from atra_spark.functions.sample import weighted_sample

        rows = [(1, "en", 0.0), (2, "en", -3.0), (3, "en", None), (4, "en", 0.5)]
        out = weighted_sample(self._df(spark, rows), 10, "w").collect()
        assert [r["doc_id"] for r in out] == [4]

    def test_per_group_quota(self, spark):
        from atra_spark.functions.sample import weighted_sample

        rows = [(i, "en" if i % 2 else "de", 1.0) for i in range(100)]
        out = weighted_sample(self._df(spark, rows), 7, "w", group_col="lang").collect()
        by = {}
        for r in out:
            by.setdefault(r["lang"], []).append(r["doc_id"])
        assert len(by["en"]) == 7 and len(by["de"]) == 7

    def test_global_topk_is_bounded_heap_not_global_sort(self, spark):
        from atra_spark.functions.sample import weighted_sample

        df = self._df(spark, [(i, "en", 1.0) for i in range(50)])
        plan = weighted_sample(df, 5, "w")._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestScriptPurity:
    def test_homoglyph_spam_flagged(self, spark):
        from atra_spark.functions.textstats import script_purity

        rows = [
            (1, "normal latin text about nothing special"),
            (2, "pаypаl verify аccount"),  # Cyrillic а inside Latin
            (3, "Привет мир как дела"),                   # pure Cyrillic
            (4, "12345 !!! ???"),                          # no script chars
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["id"]: r for r in script_purity(df).collect()}
        assert got[1]["script_purity"] == 1.0 and got[1]["n_cyrillic"] == 0
        assert got[2]["n_cyrillic"] == 3 and got[2]["script_purity"] < 0.9
        assert got[3]["script_purity"] == 1.0 and got[3]["n_latin"] == 0
        assert got[4]["script_purity"] == 1.0

    def test_zero_shuffle_plan(self, spark):
        from atra_spark.functions.textstats import script_purity

        df = spark.createDataFrame(
            [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
        )
        plan = script_purity(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSourceDupRatio:
    def test_mirror_heavy_source_flagged(self, spark):
        from atra_spark.functions.dedup import source_dup_ratio

        near = "one shared sentence that every mirror document repeats here"
        rows = [(i, near + f" t{i % 2}", "mirror") for i in range(10)] + [
            (100 + i, f"unique doc {i} " + " ".join(f"u{i}x{j}" for j in range(10)),
             "fresh")
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["source"]: r for r in source_dup_ratio(df).collect()}
        assert got["mirror"]["dup_ratio"] == 1.0 and got["mirror"]["n_dup_docs"] == 10
        assert got["fresh"]["dup_ratio"] == 0.0


class TestWorstWindowQuality:
    """textstats.worst_window_quality: the worst window lands inside
    an embedded gibberish section that the doc-level mean hides."""

    def test_finds_embedded_gibberish(self, spark):
        from atra_spark.functions.textstats import (
            bigram_lm_score,
            worst_window_quality,
        )

        fluent = "the quick brown fox jumps over the lazy dog and then "
        spam = " ".join(f"zxq{j}w" for j in range(12))
        rows = [(i, fluent * 4) for i in range(8)]  # corpus mode: fluent
        rows.append((100, fluent * 2 + spam + " " + fluent * 2))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        worst = {r["doc_id"]: r for r in worst_window_quality(df).collect()}
        mean = {r["id"]: r["lm_logprob"] for r in bigram_lm_score(df).collect()}
        # the flagged window starts inside the spam section of doc 100
        n_prefix = len((fluent * 2).split())
        n_spam = 12
        assert n_prefix - 10 <= worst[100]["worst_start"] <= n_prefix + n_spam
        # and scores far below the document's own mean
        assert worst[100]["worst_logprob"] < mean[100] - 1.0
        # a fully-fluent doc's worst window is near its mean
        assert abs(worst[0]["worst_logprob"] - mean[0]) < 1.0


class TestPackSentences:
    """textstats.pack_sentences: chunks break at sentence ends; a
    straddling sentence stays whole in the chunk where it starts."""

    def test_hand_computed(self, spark):
        from atra_spark.functions.textstats import pack_sentences

        # sentences of 4, 4, 4 tokens; block=6:
        #  s0 starts at 0 -> chunk 0; s1 starts at 4 -> chunk 0 (whole,
        #  overflows to 8 tokens); s2 starts at 8 -> chunk 1
        text = "a b c one. d e f two. g h i three."
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = {
            r["chunk_id"]: (r["n_tokens"], r["chunk_text"])
            for r in pack_sentences(df, block=6).collect()
        }
        assert got == {
            0: (8, "a b c one. d e f two."),
            1: (4, "g h i three."),
        }

    def test_no_terminal_punct_single_chunk(self, spark):
        from atra_spark.functions.textstats import pack_sentences

        df = spark.createDataFrame(
            [(1, " ".join(f"w{j}" for j in range(10)))], "doc_id long, text string"
        )
        rows = pack_sentences(df, block=4).collect()
        # one sentence (no terminator) starting at 0 -> one chunk
        assert len(rows) == 1 and rows[0]["n_tokens"] == 10


class TestCorpusDataCard:
    def test_hand_computed(self, spark):
        from atra_spark.functions.textstats import corpus_data_card

        df = spark.createDataFrame(
            [
                (1, "a b c", "web", "en"),
                (2, "d e", "web", "en"),
                (3, "f g h i", "web", "de"),
                (4, "j", "books", "en"),
            ],
            "doc_id long, text string, source string, lang string",
        )
        got = {
            (r["source"], r["lang"]): r for r in corpus_data_card(df).collect()
        }
        web_en = got[("web", "en")]
        assert web_en["n_docs"] == 2 and web_en["n_tokens"] == 5
        assert web_en["avg_tokens"] == 2.5 and web_en["token_share"] == 0.5
        assert got[("web", "de")]["n_tokens"] == 4
        assert got[("books", "en")]["token_share"] == 0.1

    def test_single_pass_plan(self, spark):
        from atra_spark.functions.textstats import corpus_data_card

        df = spark.createDataFrame(
            [(i, f"t{i} u{i}", "s", "en") for i in range(10)],
            "doc_id long, text string, source string, lang string",
        )
        plan = (
            corpus_data_card(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestNgramContainment:
    """dedup.ngram_containment_pairs: a short doc quoted inside a long
    superset scores containment ~1 in ONE direction while Jaccard
    stays low — the asymmetry the operator exists for."""

    def test_quote_inside_superset(self, spark):
        from atra_spark.functions.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        quote = "to be or not to be that is the question"
        filler = " ".join(f"filler{j} pad{j} word{j}" for j in range(30))
        df = spark.createDataFrame(
            [(1, quote), (2, f"{filler} {quote} {filler}")],
            "doc_id long, text string",
        )
        got = {
            (r["contained"], r["container"]): r["containment"]
            for r in ngram_containment_pairs(df).collect()
        }
        assert got.get((1, 2)) == 1.0      # the quote is fully contained
        assert (2, 1) not in got           # the superset is not contained
        assert ngram_jaccard_pairs(df).count() == 0  # Jaccard misses it


class TestChangeRatePriority:
    """snapshot.change_rate_priority vs hand-computed estimates."""

    def test_hand_computed(self, spark):
        from atra_spark.functions.snapshot import change_rate_priority

        hist = spark.createDataFrame(
            [
                # hot: changes every interval (2 changes / 2 intervals)
                ("a", 0, 1), ("a", 1, 2), ("a", 2, 3),
                # warm: one change in two intervals
                ("b", 0, 7), ("b", 1, 7), ("b", 2, 8),
                # cold: never changes
                ("c", 0, 5), ("c", 1, 5), ("c", 2, 5),
                # stale: observed once, long ago
                ("d", 0, 9),
            ],
            "url string, round int, digest long",
        )
        got = {r["url"]: r for r in change_rate_priority(hist, now_round=3).collect()}
        # smoothed (c + 0.5) / (intervals + 1), intervals = n_obs - 1
        assert got["a"]["n_changes"] == 2 and got["a"]["change_rate"] == 0.833333
        assert got["b"]["change_rate"] == 0.5      # (1+.5)/3
        assert got["c"]["change_rate"] == 0.166667  # (0+.5)/3
        assert got["d"]["n_obs"] == 1 and got["d"]["change_rate"] == 0.5  # prior only
        # staleness ordering: hot beats cold at same last_round; the
        # long-unseen page accumulates priority from elapsed rounds
        assert got["a"]["priority"] > got["c"]["priority"]
        assert got["d"]["priority"] == pytest.approx(3 * 0.5)


class TestCorpusDrift:
    """textstats.corpus_drift vs a serial reference of the smoothed
    log-ratio spec."""

    def test_matches_serial_reference(self, spark):
        import math
        from collections import Counter

        from atra_spark.functions.textstats import corpus_drift

        a_texts = ["the cat sat on the mat", "the dog ran fast", "cat and dog"]
        b_texts = ["the cat slept", "a bird flew over the mat", "bird song"]
        a = spark.createDataFrame(
            [(i, t) for i, t in enumerate(a_texts)], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(i, t) for i, t in enumerate(b_texts)], "doc_id long, text string"
        )
        got = {
            r["tok"]: (r["cnt_a"], r["cnt_b"], r["log_ratio"])
            for r in corpus_drift(a, b, min_count=2).collect()
        }
        ca = Counter(w for t in a_texts for w in t.lower().split())
        cb = Counter(w for t in b_texts for w in t.lower().split())
        vocab = len(set(ca) | set(cb))
        tot_a, tot_b = sum(ca.values()), sum(cb.values())
        want = {}
        for tok in set(ca) | set(cb):
            na, nb = ca[tok], cb[tok]
            if na + nb < 2:
                continue
            lr = math.log(((na + 1) / (tot_a + vocab)) / ((nb + 1) / (tot_b + vocab)))
            want[tok] = (na, nb, math.floor(lr * 1e6 + 0.5 + 1e-6) / 1e6)
        assert got == want
        assert got["dog"][2] > 0 > got["bird"][2]  # direction sanity


class TestDecontaminateSpans:
    """textstats.decontaminate_spans: verbatim benchmark spans are
    excised (overlapping windows compose into maximal regions), the
    remainder reassembles in order, short docs pass untouched, and the
    benchmark gram set broadcasts."""

    def test_excises_benchmark_span(self, spark):
        from atra_spark.functions.textstats import decontaminate_spans

        bench_sent = "what is the capital of france the answer is paris ok"  # 11 toks
        prefix = "a b c d e"
        suffix = "v w x y z"
        docs = spark.createDataFrame(
            [
                (1, f"{prefix} {bench_sent} {suffix}"),
                (2, "totally unrelated text " + " ".join(f"q{j}" for j in range(10))),
                (3, "too short"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([(0, bench_sent)], "doc_id long, text string")
        got = {r["doc_id"]: r for r in decontaminate_spans(docs, bench).collect()}
        # all 11 benchmark tokens excised (4 overlapping 8-windows
        # compose); the 5+5 surrounding tokens survive in order
        assert got[1]["clean_text"] == f"{prefix} {suffix}"
        assert got[1]["n_removed"] == 11 and got[1]["n_tokens"] == 21
        assert got[2]["n_removed"] == 0
        assert got[3]["clean_text"] == "too short" and got[3]["n_removed"] == 0

    def test_bench_gram_join_is_broadcast(self, spark):
        from atra_spark.functions.textstats import decontaminate_spans

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(20)],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(0, " ".join(f"b{j}" for j in range(12)))], "doc_id long, text string"
        )
        plan = (
            decontaminate_spans(docs, bench)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestClusterSafeSplit:
    """dedup.cluster_safe_split: near-dups share a split; the
    assignment is hash-deterministic and partitioning-invariant."""

    def test_cluster_members_share_split(self, spark):
        from atra_spark.functions.dedup import cluster_safe_split

        near = "one shared sentence that every variant document repeats here"
        rows = [(i, near + f" t{i % 2}") for i in range(40)] + [
            (100 + i, f"unique doc {i} " + " ".join(f"u{i}x{j}" for j in range(10)))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = cluster_safe_split(df).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_cluster.values())
        # the 40 near-dup docs form one cluster -> exactly one split
        big = [c for c, _ in by_cluster.items() if c == 0]
        assert big and len([r for r in out if r["cluster_id"] == 0]) == 40

    def test_deterministic_and_partitioning_invariant(self, spark):
        from atra_spark.functions.dedup import cluster_safe_split

        rows = [(i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(8)))
                for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, cluster_safe_split(df).collect()))
        b = sorted(map(tuple, cluster_safe_split(df.repartition(7)).collect()))
        assert a == b
        splits = {s for _, _, s in a}
        assert splits == {"train", "val", "test"}  # all three materialize


class TestDedupKeepBest:
    """dedup.dedup_keep_best: highest-quality member survives per
    near-dup cluster; unclustered docs untouched."""

    def test_keeps_best_per_cluster(self, spark):
        from atra_spark.functions.dedup import dedup_keep_best

        near = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, near + " v1", 10),
            (2, near + " v2", 99),   # best of the cluster
            (3, near + " v3", 50),
            (7, "a completely different unique document about spark plans", 5),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, q long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup_keep_best(df, "q").collect()
        }
        assert got == {2: 1, 7: 7}  # cluster_id = min member id, winner = max q

    def test_tie_breaks_to_lowest_id(self, spark):
        from atra_spark.functions.dedup import dedup_keep_best

        near = "one shared sentence that every variant document repeats here"
        rows = [(i, near + f" t{i % 2}", 7) for i in range(1, 5)]
        df = spark.createDataFrame(rows, "doc_id long, text string, q long")
        got = sorted(r["doc_id"] for r in dedup_keep_best(df, "q").collect())
        assert got == [1]


class TestReadability:
    """textstats.readability_scores vs hand-computed Flesch values."""

    def test_hand_computed(self, spark):
        from atra_spark.functions.textstats import readability_scores

        df = spark.createDataFrame(
            [
                (1, "The cat sat. It ran!"),
                (2, "zzz qqq."),   # no-vowel tokens hit the 1-syllable floor
                (3, "   "),        # whitespace-only: absent
            ],
            "doc_id long, text string",
        )
        got = {r["id"]: r for r in readability_scores(df).collect()}
        assert set(got) == {1, 2}
        r1 = got[1]
        assert (r1["n_sentences"], r1["n_words"], r1["n_syllables"]) == (2, 5, 5)
        assert r1["flesch"] == pytest.approx(
            206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), abs=1e-9
        )
        r2 = got[2]
        assert (r2["n_sentences"], r2["n_words"], r2["n_syllables"]) == (1, 2, 2)
        assert r2["flesch"] == pytest.approx(
            206.835 - 1.015 * 2 - 84.6 * 1, abs=1e-9
        )

    def test_zero_shuffle_plan(self, spark):
        from atra_spark.functions.textstats import readability_scores

        df = spark.createDataFrame(
            [(i, f"word{i} text here.") for i in range(20)],
            "doc_id long, text string",
        )
        plan = (
            readability_scores(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestSnapshotDiff:
    """functions.snapshot.snapshot_diff: all four statuses, empty
    sides, and payloads pruned before the join."""

    def test_all_statuses(self, spark):
        from atra_spark.functions.snapshot import snapshot_diff

        old = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "beta"), (3, "gamma prime"), (4, "delta")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
        assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
        digs = {
            r["doc_id"]: (r["old_digest"], r["new_digest"])
            for r in snapshot_diff(old, new).collect()
        }
        assert digs[1][1] is None and digs[4][0] is None
        assert digs[2][0] == digs[2][1] and digs[3][0] != digs[3][1]

    def test_empty_sides(self, spark):
        from atra_spark.functions.snapshot import snapshot_diff

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert [r["status"] for r in snapshot_diff(empty, docs).collect()] == ["added"]
        assert [r["status"] for r in snapshot_diff(docs, empty).collect()] == ["removed"]

    def test_payload_pruned_before_join(self, spark):
        """Only (key, digest) reaches the join — the text column must
        not appear in the join operator's output schema."""
        from atra_spark.functions.snapshot import snapshot_diff

        old = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
        new = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
        plan = (
            snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
        )
        join_lines = [
            ln for ln in plan.splitlines() if "Join" in ln and "FullOuter" in ln
        ]
        assert join_lines and all("text" not in ln for ln in join_lines)


class TestTrigramBackoff:
    """textstats.trigram_backoff_score vs a serial reference of the
    same spec (pruned counts, Stupid Backoff chain, mean ln score)."""

    @staticmethod
    def _serial(texts, alpha=0.4, min_count=2):
        import math
        from collections import Counter

        toks = {i: t.strip().lower().split() for i, t in texts}
        tri, bi, uni, total = Counter(), Counter(), Counter(), 0
        for ws in toks.values():
            total += len(ws)
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
            tri.update(zip(ws, ws[1:], ws[2:]))
        out = {}
        for i, ws in toks.items():
            lps = []
            for j in range(2, len(ws)):
                a, b, c = ws[j - 2], ws[j - 1], ws[j]
                if tri[(a, b, c)] >= min_count:
                    s = tri[(a, b, c)] / bi[(a, b)]
                elif bi[(b, c)] >= min_count:
                    s = alpha * bi[(b, c)] / uni[b]
                else:
                    s = alpha * alpha * uni[c] / total
                lps.append(math.log(s))
            if lps:
                out[i] = sum(lps) / len(lps)
        return out

    def test_matches_serial_reference(self, spark):
        # repeated phrases (trigrams survive pruning), singletons
        # (trigram backoff), rare bigrams (double backoff), short docs
        texts = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox sleeps"),
            (2, "the quick brown fox jumps again and again"),
            (3, "zzz qqq vvv"),          # all-singleton: full backoff
            (4, "the quick brown cat"),  # rare continuation
            (5, "two words"),            # < 3 tokens: absent
            (6, "the quick brown fox jumps over the lazy dog"),
        ]
        from atra_spark.functions.textstats import trigram_backoff_score

        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["id"]: r["trigram_logprob"]
            for r in trigram_backoff_score(df).collect()
        }
        want = self._serial(texts)
        assert set(got) == set(want)
        for i in want:
            assert got[i] == pytest.approx(want[i], abs=1e-9), i
        # the duplicated fluent doc outscores the gibberish doc
        assert got[0] > got[3]

    def test_invariant_under_input_partitioning(self, spark):
        from atra_spark.functions.textstats import trigram_backoff_score

        texts = [(i, f"w{i % 3} w{(i + 1) % 3} w{(i + 2) % 3} w{i % 5}")
                 for i in range(30)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        a = sorted(map(tuple, trigram_backoff_score(df).collect()))
        b = sorted(map(tuple, trigram_backoff_score(df.repartition(7)).collect()))
        assert [(i, round(v, 9)) for i, v in a] == [(i, round(v, 9)) for i, v in b]
