"""Model-based document filtering: train and apply a logistic-regression
document classifier over hashed token features (Spark MLlib).

Heuristic quality scores (operators/text.py) only go so far; production
training-data pipelines add a LEARNED filter (fastText-style quality /
language / domain classifiers trained on curated seed sets) and score the
whole corpus with it. This module is that path on Spark ML primitives:

- features: ``Tokenizer``-free regex split (same tokenization as text.py)
  -> ``HashingTF`` sparse vectors (vocabulary-free hashing trick — the ML-
  Vector sibling of text.feature_hash_tokens);
- model: ``LogisticRegression`` (JVM-side L-BFGS; no Python in training);
- scoring: ``model.transform`` — a map-only projection at 100 TB, the
  model broadcast to executors.

Scale notes: featurization is map-only; L-BFGS training aggregates one
gradient vector (n_features doubles) per pass — independent of corpus
size; scoring fuses into the scan. Train on a small labeled seed
(curated / weak labels), score everything: the asymmetry that makes a
learned filter tractable at 100 TB.

Determinism: training is iterative float optimization — coefficients are
NOT bit-stable across engines, so scoring queries register rows-only
(no DuckDB oracle); tests gate behavior instead: separation on held-out
data and score-sidedness on the seed labels.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import tokens


def featurize(
    docs: DataFrame,
    n_features: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Append a sparse ``features`` vector: hashed token counts
    (vocabulary-free, map-only). A NULL text tokenizes to the empty
    token list (HashingTF raises on a NULL input array)."""
    tok = F.coalesce(
        tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")
    )
    with_tok = docs.withColumn("__tok", tok)
    tf = HashingTF(inputCol="__tok", outputCol="features", numFeatures=n_features)
    return tf.transform(with_tok).drop("__tok")


def train_doc_classifier(
    labeled_docs: DataFrame,
    label_col: Column | str,
    n_features: int = 256,
    max_iter: int = 20,
    reg_param: float = 0.01,
    text_col: str = "text",
) -> LogisticRegressionModel:
    """Fit a binary document classifier on a labeled seed set.
    ``label_col`` is any boolean/0-1 expression (curated flag, weak
    label, heuristic threshold)."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    # rows whose label expression is NULL (3VL: e.g. a quality threshold
    # over NULL text) carry no supervision — drop them; MLlib's LBFGS
    # raises on NULL labels
    prepared = featurize(
        labeled_docs.withColumn("label", lab.cast("double")).where(
            F.col("label").isNotNull()
        ),
        n_features,
        text_col,
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(prepared)
    # STRIP the training summary before the model leaves this function
    # (r9). `fit` attaches a TrainingSummary that holds the live
    # SparkSession; `model.transform`'s task closure captures the model
    # WITH that summary, so the session rides into every scoring task's
    # serialized closure. That serializes fine only while the session's
    # lazy `observationManager` field is still uninitialized — the first
    # `Dataset.observe()` anywhere in the session (the iterative
    # operators' fused convergence counts) initializes it, and
    # ObservationManager is not java-Serializable, so scoring then dies
    # with NotSerializableException in any long shared session
    # (reproduced: tests/test_checkpoint_release.py before
    # tests/test_classifier.py). A save/load roundtrip returns an
    # identical model (same uid, coefficients, params — byte-equal
    # coefficient pins in tests/test_classifier.py still pass) with NO
    # summary; the write is a few KB of model metadata.
    # DEPLOYMENT NOTE (ADVICE r9): the roundtrip path goes through
    # Spark's ML writer, which resolves it against the session's Hadoop
    # DEFAULT filesystem. On local[*] (this engine's declared deployment,
    # where driver FS == default FS) the mkdtemp dir is correct and
    # rmtree cleans it. On a cluster whose default FS is HDFS/S3 the
    # same relative path would land on that FS (and rmtree would leak
    # it) — a cluster port must point this at an engine-managed scratch
    # dir on the shared FS and clean up through that FS's API.
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_lr_")
    try:
        model.write().overwrite().save(path)
        return LogisticRegressionModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def score_documents(
    model: LogisticRegressionModel,
    docs: DataFrame,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score a corpus with a trained classifier: (id, p_positive,
    predicted). Map-only — the model rides to executors as a broadcast;
    at 100 TB this is one pass over storage with no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurize(docs, n_features, text_col))
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        id_col,
        p1.alias("p_positive"),
        F.col("prediction").cast("int").alias("predicted"),
    )
