from diagon_spark.analysis.tokenizer import tokenize, tokenize_series

__all__ = ["tokenize", "tokenize_series"]
