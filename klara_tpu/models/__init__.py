from klara_tpu.models.graph import (
    Constant,
    Data,
    GenericModel,
    GibbsParameter,
    Hyperparameter,
    Parameter,
    Transformation,
    Variable,
    likelihood_model,
)

__all__ = [
    "Constant",
    "Data",
    "GenericModel",
    "GibbsParameter",
    "Hyperparameter",
    "Parameter",
    "Transformation",
    "Variable",
    "likelihood_model",
]
