"""chinese / multilingual / search analyzers (AnalyzerFactory.cpp:14-89
rows that round 1 lacked). Pure-python — no Spark session needed."""

import pandas as pd

from diagon_spark.analysis.analyzers import (analyzer_for, chinese_analyzer,
                                             multilingual_analyzer,
                                             search_analyzer)


def test_chinese_bigrams():
    az = analyzer_for("chinese")
    out = az(pd.Series(["中文搜索 engine test"])).iloc[0]
    assert out == ["中文", "文搜", "搜索", "engine", "test"]


def test_chinese_single_char_run():
    az = chinese_analyzer()
    assert az(pd.Series(["a中b"])).iloc[0] == ["a", "中", "b"]


def test_chinese_custom_segmenter():
    az = chinese_analyzer(segmenter=lambda run: [run])  # jieba stand-in
    assert az(pd.Series(["中文搜索"])).iloc[0] == ["中文搜索"]


def test_multilingual_routes_scripts():
    az = multilingual_analyzer()
    out = az(pd.Series(["Café 日本語 text"])).iloc[0]
    assert out == ["cafe", "日本", "本語", "text"]


def test_search_analyzer_synonyms():
    az = search_analyzer({"fn": ["function"]})
    assert az(pd.Series(["fn main"])).iloc[0] == ["fn", "function", "main"]
    # default chain knows code synonyms
    assert "function" in analyzer_for("search")(pd.Series(["fn"])).iloc[0]
