"""ML surface: training pipeline (reference: model-trainer/train.py) and the
registry-resolved scoring operator (reference: PredictUdf.java /
MlflowModelResolver.java), Spark-native — MLeap's row-wise LeapFrame is
replaced by whole-DataFrame ``PipelineModel.transform``."""
