"""Stage 1 — mention tagging (SURVEY.md W2, K1, W1, W5, A3).

Pipeline shape mirrors the reference tagger (src/tagger/__init__.py:84-144)
re-expressed for Spark:

  conversations --mapInPandas--> windows        (W2 tokenise+chunk; one row
                                                 per ≤512-token window)
  windows       --mapInPandas--> tagged windows (K1 batched inference; the
                                                 Arrow batch is the model
                                                 batch — many conversations
                                                 share a batch)
  tagged        --relational---> mentions       (center-slice via array
                                                 HOFs, ordered reassembly
                                                 per conv, W5 BIO decode +
                                                 A3 merge in one vectorized
                                                 UDF, posexplode for stable
                                                 mention ids)

Only the tokenizer/model/decoder sequential scans run in Python (Arrow
batched); slicing, ordering, ids, turn mapping and text recovery are
JVM-side so Catalyst can pipeline them with the surrounding stages.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bionext_spark import kernels as K
from bionext_spark import schemas
from bionext_spark.adapters import StubLexiconTagger, TaggerAdapter
from bionext_spark.config import DEFAULT_CONFIG, ENTITY_LABELS, PipelineConfig
from bionext_spark.operators import kernel_repartition as _kernel_repartition
from bionext_spark.operators.assemble import turn_of_span

# mapInPandas schemas derive from the declared stage-boundary StructTypes so
# the contract in schemas.py cannot drift from what the kernels emit
WINDOWS_SCHEMA = schemas.WINDOWS
TAGGED_WINDOWS_SCHEMA = schemas.TAGGED_WINDOWS


def window_conversations(conversations: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """W2 — tokenize each conversation doc and emit sliding windows with
    left/right contexts (reference src/data.py:169-258)."""
    max_len, ctx = cfg.max_seq_len, cfg.context_size

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "conv_id", "sequence_id", "tokens", "token_starts", "token_ends", "n_left", "n_right")}
            for conv_id, text in zip(pdf["conv_id"], pdf["doc_text"]):
                starts, ends, tokens = K.tokenize(text)
                for sid, (lo, hi, n_left, n_right) in enumerate(
                    K.make_windows(len(tokens), max_len, ctx)
                ):
                    out["conv_id"].append(conv_id)
                    out["sequence_id"].append(sid)
                    out["tokens"].append(tokens[lo:hi])
                    out["token_starts"].append(starts[lo:hi])
                    out["token_ends"].append(ends[lo:hi])
                    out["n_left"].append(n_left)
                    out["n_right"].append(n_right)
            yield pd.DataFrame(out)

    return conversations.select("conv_id", "doc_text").mapInPandas(gen, WINDOWS_SCHEMA)


def tag_windows(windows: DataFrame, tagger: TaggerAdapter | None = None) -> DataFrame:
    """K1 — batched BIO inference over windows. The adapter sees whole
    Arrow batches (the distributed analog of the reference's batch_size=8
    DataLoader at src/tagger/__init__.py:92)."""
    tagger = tagger or StubLexiconTagger([])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags = tagger.tag_batch([list(t) for t in pdf["tokens"]])
            yield pdf.assign(bio_tags=tags)

    # Kernel stages are CPU/GPU-bound, not byte-bound: spread them over all
    # cores explicitly — AQE's 64MB-target coalescing would otherwise fold
    # the windows into a handful of partitions and serialize the model.
    return _kernel_repartition(windows).mapInPandas(gen, TAGGED_WINDOWS_SCHEMA)


_SPAN_ARR = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("label_idx", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_SPAN_ARR)
def _decode_spans(tags: pd.Series, starts: pd.Series, ends: pd.Series) -> pd.Series:
    """W5 BIO decode (reference decoder.py:19-61 semantics incl. the O→I
    start rule) + A3 overlap merge, per conversation."""
    out = []
    for t, s, e in zip(tags, starts, ends):
        spans = K.merge_spans(K.decode_bio(list(t), list(s), list(e)))
        out.append([{"start": a, "end": b, "label_idx": l} for a, b, l in spans])
    return pd.Series(out)


def decode_mentions(tagged_windows: DataFrame, conversations: DataFrame) -> DataFrame:
    """W1 + W5 + A3 — strip contexts, reassemble the per-conversation tag
    stream in sequence_id order, decode spans, number mentions by span
    order, map spans back to turns. All reassembly is JVM-side array work;
    only the inherently sequential BIO scan runs in a pandas UDF."""
    center = lambda col: F.expr(  # noqa: E731 — center slice of a window array
        f"slice({col}, n_left + 1, size({col}) - n_left - n_right)"
    )
    w = tagged_windows.select(
        "conv_id",
        F.struct(
            "sequence_id",
            center("bio_tags").alias("tags"),
            center("token_starts").alias("starts"),
            center("token_ends").alias("ends"),
        ).alias("win"),
    )
    # One row per conversation: ordered concat of center slices (W1).
    per_conv = (
        w.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("win")).alias("wins"))
        .select(
            "conv_id",
            F.flatten(F.col("wins.tags")).alias("tags"),
            F.flatten(F.col("wins.starts")).alias("starts"),
            F.flatten(F.col("wins.ends")).alias("ends"),
        )
    )
    spans = per_conv.select(
        "conv_id", F.posexplode(_decode_spans("tags", "starts", "ends")).alias("mention_id", "span")
    )
    labels = F.array(*[F.lit(x) for x in ENTITY_LABELS])
    return (
        spans.join(conversations.select("conv_id", "doc_text", "turn_offsets"), "conv_id")
        .select(
            "conv_id",
            "mention_id",
            labels[F.col("span.label_idx")].alias("label"),
            F.col("span.start").alias("start"),
            F.col("span.end").alias("end"),
            F.expr("substring(doc_text, span.start + 1, span.end - span.start)").alias("text"),
            turn_of_span("turn_offsets", "span.start").alias("turn_idx"),
        )
    )


def tag_conversations_fused(
    conversations: DataFrame,
    tagger: TaggerAdapter,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Fused W2+K1+W1+W5+A3 — conversations → mentions in ONE kernel pass.

    Semantics are identical to
    ``decode_mentions(tag_windows(window_conversations(...)))`` (tested
    equal row-for-row): tokenize, window, batched tag, center-slice
    reassembly, BIO decode + overlap merge and turn mapping all happen on
    one Arrow batch of whole conversations. The three-stage form
    round-trips every window's token/offset arrays JVM→Python→JVM twice
    and shuffles them again for the per-conversation groupBy — ~3 GB of
    Arrow/shuffle traffic at bench scale whose memory-bandwidth cost is
    exactly what stops a fixed-silicon box scaling N→4N. The fused form
    moves each doc to Python once and emits only the (small) mention rows.

    Model batching is preserved: ``tag_batch`` is called once per Arrow
    batch with every window of every conversation in the batch — the same
    batch regime as the reference's DataLoader (src/tagger/__init__.py:92).

    Granularity is per-conversation, so a pathological 10^6-turn
    conversation would pin one task; ``run_tagger`` routes conversations
    above ``cfg.fused_tagger_max_turns`` through the window-parallel path
    instead (the windowed form spreads one conversation's windows across
    the whole cluster).
    """
    max_len, ctx = cfg.max_seq_len, cfg.context_size
    labels = list(ENTITY_LABELS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # phase 1 — tokenize + window every conversation in the batch;
            # all windows tag in ONE adapter call (model batch = Arrow batch)
            metas: list[tuple[list[int], list[int], list[tuple[int, int, int, int]]]] = []
            win_tokens: list[list[str]] = []
            for text in pdf["doc_text"]:
                starts, ends, tokens = K.tokenize(text)
                wins = K.make_windows(len(tokens), max_len, ctx)
                metas.append((starts, ends, wins))
                for lo, hi, _nl, _nr in wins:
                    win_tokens.append(tokens[lo:hi])
            all_tags = tagger.tag_batch(win_tokens) if win_tokens else []
            # phase 2 — per conversation: center-slice concat (W1), decode
            # (W5) + merge (A3), emit mention rows
            out: dict[str, list] = {k: [] for k in (
                "conv_id", "mention_id", "label", "start", "end", "text", "turn_idx")}
            k = 0
            for (starts, ends, wins), conv_id, doc, toffs in zip(
                metas, pdf["conv_id"], pdf["doc_text"], pdf["turn_offsets"]
            ):
                tag_stream: list[int] = []
                for lo, hi, nl, nr in wins:
                    w = all_tags[k]
                    k += 1
                    tag_stream.extend(w[nl : (hi - lo) - nr])
                spans = K.merge_spans(K.decode_bio(tag_stream, starts, ends))
                if not spans:
                    continue
                offs = np.asarray(toffs, dtype=np.int64)
                for mid, (a, b, lidx) in enumerate(spans):
                    out["conv_id"].append(conv_id)
                    out["mention_id"].append(mid)
                    out["label"].append(labels[lidx])
                    out["start"].append(a)
                    out["end"].append(b)
                    out["text"].append(doc[a:b])
                    out["turn_idx"].append(int(np.searchsorted(offs, a, side="right")) - 1)
            yield pd.DataFrame(out, columns=list(out.keys()))

    cols = conversations.select("conv_id", "doc_text", "turn_offsets")
    return _kernel_repartition(cols).mapInPandas(gen, schemas.MENTIONS)


def run_tagger(
    conversations: DataFrame,
    tagger: TaggerAdapter,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Stage 1 — fused kernel for normal conversations, window-parallel
    path for conversations longer than ``cfg.fused_tagger_max_turns``
    (skew: one giant conversation's windows spread over the cluster
    instead of pinning a single task). Both branches plan as one union —
    their stages run concurrently, and for inputs with no giant
    conversations the windowed branch processes zero rows."""
    t = cfg.fused_tagger_max_turns
    if t <= 0:
        return decode_mentions(
            tag_windows(window_conversations(conversations, cfg), tagger), conversations
        )
    short = conversations.filter(F.col("n_turns") <= t)
    giant = conversations.filter(F.col("n_turns") > t)
    return tag_conversations_fused(short, tagger, cfg).unionByName(
        decode_mentions(tag_windows(window_conversations(giant, cfg), tagger), giant)
    )
