from sbayes_tpu.model.shapes import ModelShapes  # noqa: F401
from sbayes_tpu.model.constants import ModelConstants, build_model_constants  # noqa: F401
from sbayes_tpu.model.model import Model  # noqa: F401
