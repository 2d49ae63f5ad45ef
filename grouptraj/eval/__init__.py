from grouptraj.eval.evaluate import evaluate, make_eval_step  # noqa: F401
