from .transfer import StyleTransferNet, make_transfer_plan, style_param_count  # noqa: F401
from .predictor import StylePredictor  # noqa: F401
from .inference import StyleTransferInference, make_inference_model, plan_from_config  # noqa: F401
from .training import StyleTransferTrainingModel, make_style_transfer_training_model, TrainState  # noqa: F401
