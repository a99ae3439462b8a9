from . import image_rules, kernels, sentinels, spec  # noqa: F401
from .spec import EvalResult, RuleContext, RuleSet, RuleSpec  # noqa: F401
