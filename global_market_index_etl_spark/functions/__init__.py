from .exact import cents, exact_money_sum, sql_exact_money_sum

__all__ = ["cents", "exact_money_sum", "sql_exact_money_sum"]
