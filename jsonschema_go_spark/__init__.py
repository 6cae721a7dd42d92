"""jsonschema_go_spark — a PySpark-native schema + constraint validation
engine re-expressing swaggest/jsonschema-go's semantics (see SURVEY.md) as
compiled Spark SQL predicates over columnar tables of agent transcripts.
"""

from .rules import ABSENT, Rule, TableRule
from .infer import infer_column_rule, infer_table_rule
from .compile import (
    CompileOptions,
    CompiledCheck,
    CompileError,
    RuleRegistry,
    compile_column,
    compile_pred,
    compile_table,
)
from .plans.plan import ValidationPlan

__all__ = [
    "ABSENT",
    "Rule",
    "TableRule",
    "infer_column_rule",
    "infer_table_rule",
    "CompileOptions",
    "CompiledCheck",
    "CompileError",
    "RuleRegistry",
    "compile_column",
    "compile_pred",
    "compile_table",
    "ValidationPlan",
]

__version__ = "0.1.0"
