from sopspark.functions.expr import compile_expr, ExprError

__all__ = ["compile_expr", "ExprError"]
