from .base import Model  # noqa: F401
from .noop import NoOpModel  # noqa: F401
from .mock import MockNERModel, MockRELModel, MockELModel, GAZETTEER_MODEL_KIND  # noqa: F401
from .rest import RESTModel, RetryConfig  # noqa: F401
