"""Contract tests for the production backend adapters (ml/adapters):
a real local HTTP server speaks the OpenAI-compatible wire shape
(auth header, payload fields, out-of-order embedding indices, 429
retry), and fake modules stand in for the optional heavy libraries.
Mocks keep driving the oracle queries; these prove the production
plumbing."""

from __future__ import annotations

import json
import sys
import threading
import types
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from enclaveid_data_pipeline_spark.ml.adapters import (
    HttpChatBackend,
    HttpEmbeddingBackend,
    sentence_transformer_backend,
    umap_hdbscan_label_fn,
    vllm_completion_backend,
)


class _FakeOpenAI(BaseHTTPRequestHandler):
    """Deterministic OpenAI-compatible endpoint. First request to a
    path 429s when the server's ``fail_first`` flag is set (tests the
    retry path); embedding responses come back INDEX-SHUFFLED to pin
    the client-side reorder."""

    def log_message(self, *a):  # noqa: D102 - silence test output
        pass

    def do_POST(self):  # noqa: N802 - http.server API
        srv = self.server
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        srv.requests.append(
            {"path": self.path, "auth": self.headers.get("Authorization"), "body": body}
        )
        if srv.fail_first and not srv.failed_once:
            srv.failed_once = True
            self.send_response(429)
            self.send_header("Retry-After", "0.01")
            self.end_headers()
            return
        if self.path.endswith("/chat/completions"):
            content = "echo:" + body["messages"][-1]["content"]
            resp = {"choices": [{"message": {"role": "assistant", "content": content}}]}
        elif self.path.endswith("/embeddings"):
            data = [
                {"index": i, "embedding": [float(len(t)), float(i)]}
                for i, t in enumerate(body["input"])
            ]
            resp = {"data": list(reversed(data))}  # out of order on purpose
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def api_server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    srv.requests = []
    srv.fail_first = False
    srv.failed_once = False
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _base_url(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}/v1"


def test_chat_backend_wire_contract(api_server):
    be = HttpChatBackend(
        _base_url(api_server), model="m-chat", api_key="sekret",
        system_prompt="be brief", max_tokens=64,
    )
    out = be.complete(["hello", "world"])
    assert out == ["echo:hello", "echo:world"]
    reqs = api_server.requests
    assert len(reqs) == 2
    assert reqs[0]["auth"] == "Bearer sekret"
    assert reqs[0]["body"]["model"] == "m-chat"
    assert reqs[0]["body"]["max_tokens"] == 64
    assert reqs[0]["body"]["messages"][0] == {"role": "system", "content": "be brief"}


def test_embedding_backend_batches_and_reorders(api_server):
    be = HttpEmbeddingBackend(_base_url(api_server), model="m-emb", batch_size=2)
    out = be.embed(["a", "bb", "ccc"])
    # server returns vectors reversed; client must restore input order
    assert out == [[1.0, 0.0], [2.0, 1.0], [3.0, 0.0]]
    assert len(api_server.requests) == 2  # ceil(3/2) batches
    assert api_server.requests[0]["body"]["input"] == ["a", "bb"]


def test_retry_on_429(api_server):
    api_server.fail_first = True
    be = HttpChatBackend(_base_url(api_server), model="m", backoff_s=0.01)
    assert be.complete(["x"]) == ["echo:x"]
    assert len(api_server.requests) == 2  # 429 then success


def test_embed_text_operator_over_http(spark, api_server):
    """End-to-end: the mapInPandas embedding operator with the HTTP
    adapter as its backend (python workers call the local server)."""
    from enclaveid_data_pipeline_spark.ml.llm_ops import embed_text

    url = _base_url(api_server)
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "be"), (3, None)], "id long, txt string"
    )
    out = embed_text(
        df,
        "txt",
        build_backend=lambda: HttpEmbeddingBackend(url, model="m-emb"),
        dim=2,
    )
    rows = {r.id: r.embedding for r in out.collect()}
    assert rows[1][0] == 5.0  # len("alpha")
    assert rows[2][0] == 2.0
    assert rows[3][0] == 0.0  # null → "" before the API call


def _fake_module(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def test_umap_hdbscan_label_fn_with_fake_libs(monkeypatch):
    calls = {}

    class FakeUMAP:
        def __init__(self, **kw):
            calls["umap_kw"] = kw

        def fit_transform(self, x):
            calls["umap_n"] = len(x)
            return x[:, :2]

    class FakeHDBSCAN:
        def __init__(self, **kw):
            calls["hdb_kw"] = kw

        def fit_predict(self, x):
            # alternate two clusters deterministically
            return np.array([i % 2 for i in range(len(x))])

    monkeypatch.setitem(sys.modules, "umap", _fake_module("umap", UMAP=FakeUMAP))
    monkeypatch.setitem(
        sys.modules, "hdbscan", _fake_module("hdbscan", HDBSCAN=FakeHDBSCAN)
    )
    fn = umap_hdbscan_label_fn(min_cluster_size=2, n_neighbors=5)
    vecs = np.arange(40, dtype=np.float64).reshape(10, 4)
    labels = fn(vecs)
    assert list(labels) == [i % 2 for i in range(10)]
    assert calls["umap_kw"]["metric"] == "cosine"
    assert calls["umap_kw"]["n_neighbors"] == 5  # clamped to < n
    assert calls["hdb_kw"]["min_cluster_size"] == 2
    # degenerate group: too small to cluster → all noise
    assert list(fn(vecs[:2])) == [-1, -1]
    assert fn(np.empty((0, 4))).shape == (0,)


def test_umap_hdbscan_label_fn_missing_libs(monkeypatch):
    monkeypatch.setitem(sys.modules, "umap", None)  # forces ImportError
    fn = umap_hdbscan_label_fn()
    with pytest.raises(ImportError, match="umap-learn"):
        fn(np.ones((10, 4)))


def test_cluster_embeddings_accepts_adapter_label_fn(spark):
    """The adapter's label_fn slots into cluster_embeddings and the
    operator's min-member-id remap applies on top of fake HDBSCAN
    labels. The fakes are installed INSIDE the executor worker (the
    cloudpickled wrapper carries them), because applyInPandas runs in
    separate python processes where driver-side monkeypatching is
    invisible."""

    def worker_label_fn(vectors):
        import sys
        import types

        import numpy as _np

        class FakeUMAP:
            def __init__(self, **kw): ...

            def fit_transform(self, x):
                return x

        class FakeHDBSCAN:
            def __init__(self, **kw): ...

            def fit_predict(self, x):
                return _np.array(
                    [0] * (len(x) // 2) + [-1] * (len(x) - len(x) // 2)
                )

        for name, cls_name, cls in (
            ("umap", "UMAP", FakeUMAP),
            ("hdbscan", "HDBSCAN", FakeHDBSCAN),
        ):
            mod = types.ModuleType(name)
            setattr(mod, cls_name, cls)
            sys.modules[name] = mod
        return umap_hdbscan_label_fn(min_cluster_size=2, n_neighbors=3)(vectors)

    from enclaveid_data_pipeline_spark.ml.clustering import cluster_embeddings

    df = spark.createDataFrame(
        [(1, i, [float(i), 0.0]) for i in range(8)],
        "user_id long, vec_id long, embedding array<double>",
    )
    out = cluster_embeddings(df, label_fn=worker_label_fn)
    labels = {r.vec_id: r.cluster_label for r in out.collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: -1, 5: -1, 6: -1, 7: -1}


def test_st_and_vllm_adapters_importguard():
    with pytest.raises(ImportError, match="sentence-transformers"):
        sentence_transformer_backend("any-model")
    with pytest.raises(ImportError, match="vllm"):
        vllm_completion_backend("any-model")


def test_st_adapter_with_fake_module(monkeypatch):
    class FakeST:
        def __init__(self, name, device=None):
            self.name = name

        def encode(self, texts, batch_size=64, show_progress_bar=False):
            return np.array([[float(len(t))] for t in texts])

    monkeypatch.setitem(
        sys.modules,
        "sentence_transformers",
        _fake_module("sentence_transformers", SentenceTransformer=FakeST),
    )
    be = sentence_transformer_backend("mini-lm")
    assert be.embed(["ab", "cdef"]) == [[2.0], [4.0]]


# ---- real-library smokes (skip-guarded; exercise the actual model
# path the moment an environment ships the libs) ---------------------


def test_real_sentence_transformer_smoke(spark):
    pytest.importorskip("sentence_transformers")
    from enclaveid_data_pipeline_spark.ml.adapters import (
        sentence_transformer_backend,
    )
    from enclaveid_data_pipeline_spark.ml.llm_ops import embed_text

    df = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    backend = sentence_transformer_backend("all-MiniLM-L6-v2")
    probe = backend.embed(["probe"])
    dim = len(probe[0])
    assert dim > 0
    out = embed_text(
        df,
        "text",
        lambda: sentence_transformer_backend("all-MiniLM-L6-v2"),
        dim=dim,
    ).collect()
    assert len(out) == 50
    assert all(len(r.embedding) == dim for r in out)
    # in-row alignment: same text embeds identically on both paths
    row0 = next(r for r in out if r.doc_id == 0)
    direct = backend.embed(["document number 0"])[0]
    assert all(abs(a - b) < 1e-5 for a, b in zip(row0.embedding, direct))
    backend.release()
    assert backend.model is None


def test_real_umap_hdbscan_smoke(spark):
    pytest.importorskip("umap")
    pytest.importorskip("hdbscan")
    import numpy as np
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.ml.adapters import umap_hdbscan_label_fn
    from enclaveid_data_pipeline_spark.ml.clustering import cluster_embeddings

    # two well-separated blobs per group + a lone outlier: HDBSCAN
    # must find >=2 clusters and may mark the outlier noise (-1 ->
    # the operator's noise contract)
    rng = np.random.default_rng(7)
    rows = []
    for g in ("u1", "u2"):
        for c, center in enumerate(([0.0] * 8, [10.0] * 8)):
            for i in range(24):
                v = (np.array(center) + rng.normal(0, 0.1, 8)).tolist()
                rows.append((g, len(rows), v))
        rows.append((g, len(rows), (np.array([5.0] * 8)).tolist()))
    df = spark.createDataFrame(
        rows, "user_id string, item_id long, embedding array<double>"
    )
    out = cluster_embeddings(
        df,
        vec_col="embedding",
        group_cols=("user_id",),
        id_col="item_id",
        label_fn=umap_hdbscan_label_fn(
            n_components=2, n_neighbors=10, min_cluster_size=5
        ),
    )
    per_group = (
        out.groupBy("user_id")
        .agg(F.countDistinct("cluster_label").alias("n_labels"))
        .collect()
    )
    assert all(r.n_labels >= 2 for r in per_group)
    assert out.count() == len(rows)
