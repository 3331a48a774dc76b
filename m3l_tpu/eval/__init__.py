from .tacbench import TestTaskSL, TestForceSL, TestSlipSL, TestPoseSL, TestGraspSL, TestTextileSL, classification_metrics  # noqa: F401
from .plots import plot_correlation, plot_forces_error  # noqa: F401
