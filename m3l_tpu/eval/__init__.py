from .tacbench import TestTaskSL, TestForceSL, TestSlipSL, TestPoseSL, TestGraspSL, TestTextileSL, classification_metrics  # noqa: F401
