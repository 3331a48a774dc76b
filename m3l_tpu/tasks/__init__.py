from .attentive_pooler import AttentivePooler, AttentiveClassifier  # noqa: F401
from .probes import ForceLinearProbe, SlipProbe, SlipForceProbe, PoseLinearProbe, GraspLinearProbe, TextileLinearProbe  # noqa: F401
from .sl_module import SLModuleBase, EncoderWrapper, load_encoder_from_checkpoint  # noqa: F401
from .modules import ForceSLModule, SlipSLModule, PoseSLModule, GraspSLModule, TextileSLModule  # noqa: F401
from .forcefield import ForceFieldDecoder, ForceFieldModule, warp, ssim, photometric_loss  # noqa: F401
from .forcefield_geometry import (  # noqa: F401
    GeometricForceFieldModule,
    PoseDecoder,
    PoseEstimator,
    backproject_depth,
    compute_sl_force,
    digit_intrinsics,
    disp_to_depth,
    grid_sample,
    plot_quiver,
    plot_quiver_img,
    project_3d,
    rot_from_axisangle,
    transformation_from_parameters,
)
