"""One-shot trainer: fit the bot-detector on sf0.01 and freeze the
PipelineModel into the local registry (models/bot_detector/Production/),
so scoring queries are reproducible across sessions without retraining
(SURVEY.md §7 hard part 5).

Run: python scripts/train_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.ml.features import build_training_frame
from streaming_ml_with_ksql_spark.ml.train import save_model, train_bot_detector
from streaming_ml_with_ksql_spark.session import get_spark

MODEL_NAME = "bot_detector"
STAGE = "Production"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    models_dir = os.path.join(repo_root, "models")

    spark = get_spark(app_name="train_bot_detector")
    frame = build_training_frame(
        io_mod.load_table(spark, sf_dir, "events"),
        io_mod.load_table(spark, sf_dir, "customer"),
    )
    model, auc = train_bot_detector(frame)
    root = save_model(model, models_dir, MODEL_NAME, STAGE)
    print(f"saved {root} (test AUC={auc:.4f})")

    # Freeze a small (input → expected prediction) sample for the scoring
    # self-check (FIXTURES.md C4): deterministic head by event_id.
    from streaming_ml_with_ksql_spark.ml.predict import clear_model_cache, score

    clear_model_cache()
    sample = frame.orderBy("event_id").limit(200)
    preds = score(sample, MODEL_NAME, models_dir=models_dir).select(
        "event_id", "prediction"
    )
    out = os.path.join(models_dir, MODEL_NAME, STAGE, "frozen_predictions")
    preds.coalesce(1).write.mode("overwrite").parquet(out)
    print(f"froze predictions to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
