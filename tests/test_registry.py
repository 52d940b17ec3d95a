"""Registry surface tests (SURVEY.md §2.3 S1-S6).

Mirrors the reference's node integration suite:
- add/list round-trip + idempotent dedup (host-go/store/store.go:31-33,
  tests/integration/node/add_list_test.go)
- id validation + unknown-id identity
  (tests/integration/node/transform_test.go:16-135)
- txn commit/discard visibility (host-go/repository/txn.go:9-41,
  tests/multiplier/txn_commit.go, txn_discard.go)
- two-registry sync (tests/integration/node/add_sync_list_test.go)
"""

from __future__ import annotations

import pytest

from lens_spark.errors import InvalidLensIdError, LensError
from lens_spark.model import LensConfig, is_valid_content_id
from lens_spark.registry import Registry

RENAME = {"lenses": [{"name": "rename",
                      "arguments": {"src": "Name", "dst": "FullName"}}]}
ADD5 = {"lenses": [{"name": "add", "arguments": {"column": "Age", "magnitude": 5}}]}


@pytest.fixture()
def registry(tmp_path):
    return Registry(tmp_path / "reg")


def test_add_is_idempotent_and_content_addressed(registry):
    id1 = registry.add(RENAME)
    # key-order / formatting variations canonicalize to the same id
    id2 = registry.add(
        '{"lenses": [{"arguments": {"dst": "FullName", "src": "Name"}, '
        '"name": "rename"}]}'
    )
    assert id1 == id2
    assert is_valid_content_id(id1)
    assert len(list((registry.specs_dir).glob("lens1-*.json"))) == 1
    assert registry.add(ADD5) != id1


def test_list_and_reload(registry, tmp_path):
    id1, id2 = registry.add(RENAME), registry.add(ADD5)
    assert set(registry.list()) == {id1, id2}
    # a second registry over the same root reconstructs everything (S3)
    warm = Registry(tmp_path / "reg")
    assert set(warm.list()) == {id1, id2}
    assert warm.get(id1).to_dict() == LensConfig.from_dict(RENAME).to_dict()


def test_transform_and_inverse_by_id(registry, people):
    lens_id = registry.add(RENAME)
    out = registry.transform(people, lens_id)
    assert out.columns == ["FullName", "Age"]
    back = registry.inverse(out, lens_id)
    assert back.columns == ["Name", "Age"]
    assert sorted(r.Name for r in back.collect()) == ["Fred", "John", "Orpheus"]


def test_unknown_id_is_identity_but_malformed_id_raises(registry, people):
    unknown = "lens1-" + "ab" * 32
    assert registry.transform(people, unknown) is people
    with pytest.raises(InvalidLensIdError):
        registry.transform(people, "not-a-lens-id")


def test_txn_commit_publishes_atomically(registry, tmp_path):
    with registry.txn() as txn:
        lens_id = txn.add(RENAME)
        # staged spec visible inside the txn, not outside (S5)
        assert txn.get(lens_id) is not None
        assert registry.get(lens_id) is None
    assert registry.get(lens_id) is not None
    assert set(Registry(tmp_path / "reg").list()) == {lens_id}


def test_txn_discard_drops_staged_writes(registry):
    txn = registry.txn()
    lens_id = txn.add(RENAME)
    txn.discard()
    assert registry.get(lens_id) is None
    assert registry.list() == {}


def test_txn_error_discards(registry):
    with pytest.raises(RuntimeError):
        with registry.txn() as txn:
            txn.add(RENAME)
            raise RuntimeError("boom")
    assert registry.list() == {}


def test_readonly_txn_rejects_writes(registry):
    with pytest.raises(LensError):
        registry.txn(readonly=True).add(RENAME)


def test_txn_transform_sees_staged_spec(registry, people):
    with registry.txn() as txn:
        lens_id = txn.add(RENAME)
        assert txn.transform(people, lens_id).columns == ["FullName", "Age"]


def test_sync_from_copies_spec_with_same_id(registry, tmp_path):
    remote = Registry(tmp_path / "remote")
    lens_id = remote.add(RENAME)
    assert registry.sync_from(remote, lens_id) == lens_id
    assert registry.get(lens_id).to_dict() == remote.get(lens_id).to_dict()
    with pytest.raises(LensError):
        registry.sync_from(remote, "lens1-" + "00" * 32)


def test_sync_from_any_first_serving_peer_wins(registry, tmp_path):
    empty = Registry(tmp_path / "peer_empty")
    holder = Registry(tmp_path / "peer_holder")
    lens_id = holder.add(RENAME)
    got = registry.sync_from_any(
        [tmp_path / "peer_missing", empty, holder], lens_id, timeout=2.0)
    assert got == lens_id and registry.get(lens_id) is not None


def test_sync_from_any_polls_until_late_publish(registry, tmp_path):
    """The reference's add-sync fetches from peers until the block
    arrives or the context times out (p2p.go:19-88) — a publish landing
    mid-poll must be picked up."""
    import threading

    peer = Registry(tmp_path / "peer_late")
    lens_id = LensConfig.from_dict(RENAME).content_id()

    def publish_later():
        import time

        time.sleep(0.6)
        peer.add(RENAME)

    t = threading.Thread(target=publish_later)
    t.start()
    try:
        got = registry.sync_from_any([peer], lens_id, timeout=10.0,
                                     retry_interval=0.1)
    finally:
        t.join()
    assert got == lens_id


def test_sync_from_any_times_out(registry, tmp_path):
    peer = Registry(tmp_path / "peer_never")
    with pytest.raises(LensError, match="within"):
        registry.sync_from_any([peer], "lens1-" + "00" * 32,
                               timeout=0.5, retry_interval=0.1)


def test_pipeline_inversion_through_registry(registry, people):
    """E8 via stored spec: transform then inverse round-trips a 2-stage
    pipeline (reverse order + flip each module)."""
    spec = {"lenses": RENAME["lenses"] + ADD5["lenses"]}
    lens_id = registry.add(spec)
    out = registry.transform(people, lens_id)
    assert out.columns == ["FullName", "Age"]
    assert {r.Age for r in out.collect()} == {35, 36, 37}
    back = registry.inverse(out, lens_id)
    assert back.columns == ["Name", "Age"]
    assert {r.Age for r in back.collect()} == {30, 31, 32}


# -- chunked artifact blocks (block.go:135-172 analogue) ---------------------

def test_artifact_chunked_roundtrip_and_idempotence(registry):
    """Bytes above the chunk cap split into multiple blocks and
    reassemble exactly; identical bytes store once (S1 idempotence)."""
    data = bytes(range(256)) * 1000  # 256 KB
    art_id = registry.add_artifact(data, chunk_size=100_000)
    assert registry.is_valid_artifact_id(art_id)
    chunk_files = sorted((registry.blocks_dir / art_id).glob("*.chunk"))
    assert len(chunk_files) == 3  # 256000 / 100000 -> 3 chunks
    assert registry.get_artifact(art_id) == data
    assert registry.add_artifact(data, chunk_size=50_000) == art_id
    # idempotent add didn't re-chunk the existing artifact
    assert sorted((registry.blocks_dir / art_id).glob("*.chunk")) == chunk_files


def test_artifact_corruption_fails_loudly(registry):
    data = b"x" * 10_000
    art_id = registry.add_artifact(data, chunk_size=4_000)
    victim = sorted((registry.blocks_dir / art_id).glob("*.chunk"))[1]
    victim.write_bytes(b"tampered")
    with pytest.raises(LensError, match="content verification"):
        registry.get_artifact(art_id)


def test_artifact_unknown_and_malformed_ids(registry):
    with pytest.raises(LensError, match="not found"):
        registry.get_artifact("lens1b-" + "00" * 32)
    from lens_spark.errors import InvalidLensIdError

    with pytest.raises(InvalidLensIdError):
        registry.get_artifact("not-an-artifact-id")


def test_artifact_sync_between_registries(registry, tmp_path):
    peer = Registry(tmp_path / "peer_blocks")
    data = b"shared module bytes" * 500
    art_id = peer.add_artifact(data, chunk_size=1_000)
    assert not registry.has_artifact(art_id)
    got = registry.sync_artifact_from(peer, art_id)
    assert got == art_id and registry.get_artifact(art_id) == data


_ARTIFACT_MODULE_SRC = """
OUTPUT_SCHEMA = "Name string, Age bigint"

def transform(batches, params):
    for pdf in batches:
        out = pdf.copy()
        out["Age"] = out["Age"] + int(params.get("shift", 0))
        yield out
"""


def test_module_loads_from_registry_artifact(registry, people):
    """A Python lens module stored as a chunked registry artifact loads
    and runs through the normal opt-in gate (the reference serves lens
    WASM bytes back out of its block store the same way)."""
    from lens_spark import engine
    from lens_spark.modules import allow_module_paths, load_module_artifact

    art_id = registry.add_artifact(_ARTIFACT_MODULE_SRC.encode(),
                                   chunk_size=64)
    allow_module_paths(True)
    try:
        name = load_module_artifact(registry, art_id)
    finally:
        allow_module_paths(False)
    out = engine.append(
        people, {"lenses": [{"name": name, "arguments": {"shift": 5}}]})
    assert {r.Age for r in out.collect()} == {35, 36, 37}


def test_module_artifact_respects_optin_gate(registry):
    from lens_spark.modules import allow_module_paths, load_module_artifact

    art_id = registry.add_artifact(b"OUTPUT_SCHEMA = 'a string'\n"
                                   b"def transform(b, p):\n    yield None\n")
    allow_module_paths(False)
    with pytest.raises(LensError, match="disabled"):
        load_module_artifact(registry, art_id)


def test_has_artifact_rejects_invalid_ids(tmp_path):
    """Traversal-shaped ids must return False without touching the FS."""
    from lens_spark.registry import Registry

    registry = Registry(tmp_path / "reg_artval")
    art_id = registry.add_artifact(b"payload bytes", chunk_size=4)
    assert registry.has_artifact(art_id)
    assert not registry.has_artifact("../specs/" + art_id)
    assert not registry.has_artifact("..")
    assert not registry.has_artifact("")
    assert not registry.has_artifact("ZZ/not-hex")


def test_vacuum_artifacts_sweeps_unreferenced_blocks(tmp_path):
    """Write → reference one artifact from a spec → discard another in a
    txn → vacuum: the unreferenced block is removed and storage shrinks,
    the referenced one survives."""
    from lens_spark.registry import Registry

    registry = Registry(tmp_path / "reg_gc")
    live_id = registry.add_artifact(b"live module bytes " * 100, chunk_size=256)
    dead_id = registry.add_artifact(b"orphaned bytes " * 100, chunk_size=256)

    # a committed spec references live_id in its arguments
    registry.add({"lenses": [{"name": "identity",
                              "arguments": {"module_artifact": live_id}}]})
    # an overwrite staged in a txn then discarded leaves dead_id orphaned
    with registry.txn() as txn:
        txn.add({"lenses": [{"name": "identity",
                             "arguments": {"module_artifact": dead_id}}]})
        txn.discard()

    def du(reg):
        return sum(p.stat().st_size for p in reg.blocks_dir.rglob("*.chunk"))

    before = du(registry)
    # default grace window protects the JUST-written unreferenced block
    # (it may be a publish-in-progress: add_artifact renames to final
    # before the referencing spec persists)
    untouched = registry.vacuum_artifacts()
    assert untouched["removed"] == [] and untouched["kept"] == 2
    # grace 0 = operator asserts no publish is in flight
    report = registry.vacuum_artifacts(staging_grace_sec=0.0)
    assert report["removed"] == [dead_id]
    assert report["kept"] == 1
    assert report["bytes_freed"] > 0
    assert du(registry) == before - report["bytes_freed"]
    assert registry.has_artifact(live_id)
    assert not registry.has_artifact(dead_id)
    # referenced artifact still reassembles intact
    assert registry.get_artifact(live_id) == b"live module bytes " * 100


def test_vacuum_artifacts_keep_list_and_fresh_staging(tmp_path):
    from lens_spark.registry import Registry

    registry = Registry(tmp_path / "reg_gc2")
    pinned = registry.add_artifact(b"pinned but unreferenced", chunk_size=8)
    # simulate an in-flight writer: fresh staging dir must survive
    staging = registry.blocks_dir / ".staging-inflight"
    staging.mkdir()
    (staging / "00000000.chunk").write_bytes(b"partial")
    report = registry.vacuum_artifacts(keep=[pinned])
    assert report["removed"] == []
    assert registry.has_artifact(pinned)
    assert staging.exists()
    # aged-out staging dirs are reaped
    report = registry.vacuum_artifacts(keep=[pinned], staging_grace_sec=0.0)
    assert not staging.exists()


# -- fitted-model artifacts (r8 verdict #7) ----------------------------------


def test_model_save_load_round_trip_and_idempotence(registry):
    """Every model kind round-trips exactly (floats bit-identical via
    shortest-repr JSON); the same model content-addresses to the same
    id; kind/format/version mismatches are loud errors."""
    from lens_spark.models import load_model, save_model

    merges = [["a", "b"], ["ab", "</w>"]]
    weights = {"weights": [0.1, -0.25, 1e-17, 3.141592653589793],
               "bias": -0.1}
    cent = [[0.5, -1.5], [2.25, 0.0]]
    mid1 = save_model(registry, "bpe_merges", merges)
    mid2 = save_model(registry, "bpe_merges", merges)
    assert mid1 == mid2 and mid1.startswith("lens1b-")
    assert load_model(registry, mid1, expect_kind="bpe_merges") == merges
    wid = save_model(registry, "linear_classifier", weights)
    got = load_model(registry, wid, expect_kind="linear_classifier")
    assert got == weights  # exact float equality — JSON shortest-repr
    cid = save_model(registry, "kmeans_centroids", cent)
    assert load_model(registry, cid) == cent
    # kind pinning: applying a kmeans artifact as a tokenizer errors
    with pytest.raises(LensError, match="needs 'bpe_merges'"):
        load_model(registry, cid, expect_kind="bpe_merges")
    with pytest.raises(LensError, match="unknown model kind"):
        save_model(registry, "not_a_kind", merges)
    with pytest.raises(LensError, match="not JSON-serializable"):
        save_model(registry, "kmeans_centroids", [[float("nan")]])
    # a non-envelope artifact is rejected as a model
    raw = registry.add_artifact(b"just bytes")
    with pytest.raises(LensError, match="not a model envelope|not a lens_spark_model"):
        load_model(registry, raw)


def test_saved_tokenizer_applies_identically_via_lens_file(spark, registry):
    """The fit-once/apply-many pipeline: bpe fitted+saved once, then a
    LENS FILE applies the saved tokenizer by model_id — output equals
    the fit-inline bpe_tokenize on the same corpus (byte-identical
    token arrays), and inverse drops the appended columns."""
    from lens_spark import engine
    from lens_spark.models import save_bpe
    from lens_spark.operators.bpe import bpe_tokenize

    rows = [(i, "the cat sat on the mat " * (1 + i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mid = save_bpe(registry, df, "text", num_merges=12, min_count=1)
    spec = {"lenses": [{"name": "bpe_tokenize", "arguments": {
        "column": "text", "model_id": mid,
        "registry": str(registry.root)}}]}
    via_model = {r.doc_id: r.bpe_tokens
                 for r in engine.append(df, spec).collect()}
    inline = {r.doc_id: r.bpe_tokens
              for r in bpe_tokenize(df, "text", num_merges=12,
                                    min_count=1).collect()}
    assert via_model == inline
    back = engine.inverse(engine.append(df, spec), spec)
    assert back.columns == ["doc_id", "text"]


def test_saved_classifier_and_kmeans_apply_by_model_id(spark, registry):
    """classifier_score and kmeans lenses accept model_id+registry:
    scoring equals inline weights; assignment equals the fitted run
    (kmeans by model_id is assign-only — no refit)."""
    from lens_spark import engine
    from lens_spark.models import save_kmeans, save_model
    from lens_spark.operators.clustering import kmeans
    from lens_spark.operators.text import classifier_score

    weights = [round((-1) ** i * (i + 1) / 7.0, 6) for i in range(8)]
    wid = save_model(registry, "linear_classifier",
                     {"weights": weights, "bias": 0.25})
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}") for i in range(30)],
        "doc_id long, text string")
    spec = {"lenses": [{"name": "classifier_score", "arguments": {
        "id": "doc_id", "column": "text", "model_id": wid,
        "registry": str(registry.root)}}]}
    via_model = {r.doc_id: r.clf_score
                 for r in engine.append(docs, spec).collect()}
    inline = {r.doc_id: r.clf_score
              for r in classifier_score(docs, "doc_id", "text",
                                        weights=weights,
                                        bias=0.25).collect()}
    assert via_model == inline
    vecs = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 3) % 5)]) for i in range(40)],
        "id long, v array<double>")
    kid = save_kmeans(registry, vecs, "id", "v", k=4, max_iter=5)
    kspec = {"lenses": [{"name": "kmeans", "arguments": {
        "vector": "v", "model_id": kid,
        "registry": str(registry.root)}}]}
    via_kmodel = {r.id: r.cluster
                  for r in engine.append(vecs, kspec).collect()}
    fitted = {r.id: r.cluster
              for r in kmeans(vecs, "id", "v", k=4, max_iter=5).collect()}
    assert via_kmodel == fitted


def test_model_artifact_survives_vacuum_when_spec_references_it(
        spark, registry):
    """A model artifact named by a PERSISTED spec (model_id in the lens
    arguments) is live under vacuum_artifacts — the fit-once pipeline's
    model can't be garbage-collected out from under its spec."""
    from lens_spark.models import save_model

    mid = save_model(registry, "bpe_merges", [["a", "b"]])
    orphan = registry.add_artifact(b"orphaned model bytes")
    registry.add({"lenses": [{"name": "bpe_tokenize", "arguments": {
        "column": "text", "model_id": mid,
        "registry": str(registry.root)}}]})
    import os
    import time
    old = time.time() - 7200
    for aid in (mid, orphan):
        os.utime(registry.blocks_dir / aid, (old, old))
    report = registry.vacuum_artifacts(staging_grace_sec=3600)
    assert orphan in report["removed"]
    assert registry.has_artifact(mid) and not registry.has_artifact(orphan)


def test_saved_vocab_applies_identically_via_lens_file(spark, registry):
    """token_vocab artifacts: vocab_apply(vocab_fit(df)) equals the
    in-plan vocab_encode exactly (same ordering contract), the lens
    model_id path matches, and `lowercase` travels WITH the model
    (fit/apply tokenization mismatch is the silent-OOV bug)."""
    from lens_spark import engine
    from lens_spark.models import load_model, save_vocab
    from lens_spark.operators.text import (
        vocab_apply, vocab_encode, vocab_fit,
    )

    rows = [(i, f"Alpha beta w{i % 7} gamma") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inline = {r.doc_id: r.token_ids
              for r in vocab_encode(df, "doc_id", "text",
                                    vocab_size=8).collect()}
    vocab = vocab_fit(df, "text", vocab_size=8)
    assert len(vocab) == 8 and [i for _, i in vocab] == list(range(1, 9))
    applied = {r.doc_id: r.token_ids
               for r in vocab_apply(df, "doc_id", "text", vocab).collect()}
    assert applied == inline
    mid = save_vocab(registry, df, "text", vocab_size=8)
    assert load_model(registry, mid)["lowercase"] is True
    spec = {"lenses": [{"name": "vocab_encode", "arguments": {
        "id": "doc_id", "column": "text", "model_id": mid,
        "registry": str(registry.root)}}]}
    via_model = {r.doc_id: r.token_ids
                 for r in engine.append(df, spec).collect()}
    assert via_model == inline
    # applying the saved vocab to NEW docs: unseen words -> oov_id 0
    new = spark.createDataFrame([(100, "alpha unseenword")],
                                "doc_id long, text string")
    got = engine.append(new, spec).collect()[0].token_ids
    alpha_id = dict(vocab)["alpha"]
    assert got == [alpha_id, 0]
