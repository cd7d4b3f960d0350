"""robots.txt parser + RFC 9309 longest-match filter
(functions/robots.py): group selection, wildcard/anchor rules, tie
semantics, and the relational Spark path."""

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.functions.robots import (
    is_allowed,
    parse_robots_text,
    robots_filter,
    robots_rules_df,
    rule_to_regex,
)

ROBOTS = """
# politeness file
User-agent: *
Disallow: /

User-agent: trainbot
User-agent: otherbot
Disallow: /private/
Allow: /private/doc
Disallow: /*.tmp$

User-agent: trainbot
Disallow: /extra/
"""


def test_group_selection_exact_beats_star():
    rules = parse_robots_text(ROBOTS, "TrainBot")  # case-insensitive
    assert (False, "/") not in rules  # the * group must NOT bind
    assert (False, "/private/") in rules
    assert (True, "/private/doc") in rules
    assert (False, "/extra/") in rules  # both matching groups merge


def test_star_group_binds_unknown_agent():
    rules = parse_robots_text(ROBOTS, "strangerbot")
    assert rules == [(False, "/")]


def test_longest_match_and_tie_semantics():
    rules = parse_robots_text(ROBOTS, "trainbot")
    assert is_allowed(rules, "/public/doc1.html")       # no rule matches
    assert not is_allowed(rules, "/private/x.html")     # Disallow /private/
    assert is_allowed(rules, "/private/doc9.html")      # Allow len 12 wins
    assert not is_allowed(rules, "/public/doc5.tmp")    # $ wildcard rule
    assert is_allowed(rules, "/private/doc5.tmp")       # Allow(12) > tmp(7)
    assert not is_allowed(rules, "/extra/thing")


def test_rule_to_regex_shapes():
    assert rule_to_regex("/a/*.x$") == r"^/a/.*\.x$"
    assert rule_to_regex("/plain") == r"^/plain"
    # regex metacharacters in paths stay literal
    assert is_allowed([(False, "/a+b(c)")], "/a+b(c)d") is False
    assert is_allowed([(False, "/a+b(c)")], "/aab") is True


def test_empty_disallow_and_comments_ignored():
    rules = parse_robots_text(
        "User-agent: x\nDisallow:\nAllow: /ok # trailing comment\n"
        "Crawl-delay: 3\nSitemap: https://e/s.xml\n",
        "x",
    )
    assert rules == [(True, "/ok")]


def test_relational_path_matches_python_twin(spark):
    robots = spark.createDataFrame(
        [("h1", ROBOTS), ("h2", "User-agent: *\nDisallow: /no/\n"),
         ("h3", None)],
        "host STRING, robots_txt STRING",
    )
    rules = robots_rules_df(robots, agent="trainbot")
    paths = [
        ("h1", "/public/a.html"), ("h1", "/private/a.html"),
        ("h1", "/private/doc1.tmp"), ("h1", "/public/a.tmp"),
        ("h1", "/extra/x"),
        ("h2", "/no/x"), ("h2", "/yes/x"),
        ("h3", "/anything"),
        ("h4", "/no-robots-host"),
    ]
    urls = spark.createDataFrame(
        [(f"https://{h}{p}", h, p) for h, p in paths],
        "url STRING, host STRING, path STRING",
    )
    out = {r["url"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert len(out) == len(paths)  # no url lost, even all-rules-miss hosts
    py_rules = {
        "h1": parse_robots_text(ROBOTS, "trainbot"),
        "h2": parse_robots_text("User-agent: *\nDisallow: /no/\n", "trainbot"),
        "h3": [], "h4": [],
    }
    for h, p in paths:
        assert out[f"https://{h}{p}"] == is_allowed(py_rules[h], p), (h, p)
    # broadcast-join plan: the corpus side must not shuffle for the join
    plan = robots_filter(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
