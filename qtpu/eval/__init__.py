from qtpu.eval.perplexity import evaluate_perplexity  # noqa: F401
