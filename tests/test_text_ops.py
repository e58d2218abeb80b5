

def test_bpe_merge_steps_hand_computed(spark):
    """Sennrich-style fixture: low x5, lower x2, newest x6, widest x3.
    Pair freqs: es=9, st=9 (tie -> '{e}{s}' wins on text), then est=9,
    then lo=7/ow=7 (tie -> '{l}{o}')."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        text as TX,
    )

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    rules = [
        (r["step"], r["pair"], r["merged"], r["freq"])
        for r in TX.bpe_merge_steps(df, n_merges=3).collect()
    ]
    assert rules == [
        (1, "{e}{s}", "{es}", 9),
        (2, "{es}{t}", "{est}", 9),
        (3, "{l}{o}", "{lo}", 7),
    ]


def test_bpe_merge_steps_single_char_words_no_pairs(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E501
        text as TX,
    )

    df = spark.createDataFrame([("a i a i ab",)], "text string")
    rules = TX.bpe_merge_steps(df, n_merges=1).collect()
    # only 'ab' contributes a pair
    assert len(rules) == 1
    assert rules[0]["pair"] == "{a}{b}" and rules[0]["freq"] == 1
