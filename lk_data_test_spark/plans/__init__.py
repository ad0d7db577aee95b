from .rules import (  # noqa: F401
    VERDICT_SCHEMA,
    VIOLATION_SCHEMA,
    Rule,
    RuleContext,
    RuleResult,
    default_rules,
)
from .manifest import CheckpointManifest  # noqa: F401
from .runner import ValidationRunner  # noqa: F401
