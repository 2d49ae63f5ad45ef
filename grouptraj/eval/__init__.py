from grouptraj.eval.evaluate import (  # noqa: F401
    evaluate, evaluate_bucketed, make_eval_step,
)
