"""Content-corrupt tweets fixture builder (FIXTURES.md §1).

Generates a 31-column CSV + matching ``name=Type`` schema file shaped
like the public Twitter election-integrity datasets the reference
targets. Corrupt rows are corrupt **by content** (bad ``tweet_time``),
not by CSV-parser quirk (SURVEY §4.3).
"""

from __future__ import annotations

import csv
import os

# (name, type) in CSV column order — tweets.schema:3-33 shape.
COLUMNS: list[tuple[str, str]] = [
    ("tweetid", "Long"),
    ("userid", "String"),
    ("user_display_name", "String"),
    ("user_screen_name", "String"),
    ("user_reported_location", "String"),
    ("user_profile_description", "String"),
    ("user_profile_url", "String"),
    ("follower_count", "Long"),
    ("following_count", "Long"),
    ("account_creation_date", "String"),
    ("account_language", "String"),
    ("tweet_language", "String"),
    ("tweet_text", "String"),
    ("tweet_time", "String"),
    ("tweet_client_name", "String"),
    ("in_reply_to_tweetid", "Long"),
    ("in_reply_to_userid", "String"),
    ("quoted_tweet_tweetid", "Long"),
    ("is_retweet", "Boolean"),
    ("retweet_userid", "String"),
    ("retweet_tweetid", "Long"),
    ("latitude", "Double"),
    ("longitude", "Double"),
    ("quote_count", "Long"),
    ("reply_count", "Long"),
    ("like_count", "Long"),
    ("retweet_count", "Long"),
    ("hashtags", "String"),
    ("urls", "String"),
    ("user_mentions", "String"),
    ("poll_choices", "String"),
]

# Valid (year, month) pairs -> the expected Hive partition tree.
VALID_TIMES = [
    "2014-07-12 09:15",
    "2014-11-03 18:00",
    "2015-02-14 02:30",
    "2015-03-01 23:59",
    "2015-05-20 11:11",
    "2015-11-30 05:45",
    "2016-04-01 00:00",
    "2017-02-28 16:20",
    "2017-03-08 08:08",
    "2017-03-09 10:10",  # second row in an existing partition
]
EXPECTED_PARTITIONS = {
    ("2014", "07"), ("2014", "11"),
    ("2015", "02"), ("2015", "03"), ("2015", "05"), ("2015", "11"),
    ("2016", "04"),
    ("2017", "02"), ("2017", "03"),
}
# Corrupt by content: empty, garbage, truncated date, seconds appended.
CORRUPT_TIMES = ["", "not a time", "2016-04", "2016-04-01 00:00:00"]


def _row(i: int, time_value: str) -> dict[str, str]:
    uid = f"{i:02d}" + "ab" * 31  # 64-char hex-ish digest
    text_variants = [
        'Polls are "rigged", they said — vote!',
        "Выборы сегодня, приходите на участки",  # Cyrillic
        "check this out, really: https://t.co/x1",
        "plain tweet #election",
    ]
    return {
        "tweetid": str(700000000000000000 + i),
        "userid": uid,
        "user_display_name": uid,
        "user_screen_name": uid,
        "user_reported_location": "Москва" if i % 3 == 0 else "",
        "user_profile_description": f"#news, politics commentary {i}",
        "user_profile_url": f"https://example.org/u/{i}" if i % 2 == 0 else "",
        "follower_count": str(100 * i),
        "following_count": str(50 * i),
        "account_creation_date": "2013-05-01",
        "account_language": "en" if i % 2 == 0 else "ru",
        "tweet_language": ["en", "ru", "bg"][i % 3],
        "tweet_text": text_variants[i % 4],
        "tweet_time": time_value,
        "tweet_client_name": "Twitter Web Client",
        "in_reply_to_tweetid": str(600000000000000000 + i) if i % 4 == 0 else "",
        "in_reply_to_userid": "",
        "quoted_tweet_tweetid": "",
        "is_retweet": "true" if i % 3 == 0 else "false",
        "retweet_userid": "",
        "retweet_tweetid": "",
        "latitude": "55.75" if i % 5 == 0 else "",
        "longitude": "37.61" if i % 5 == 0 else "",
        "quote_count": str(i),
        "reply_count": str(i * 2),
        "like_count": str(i * 3),
        "retweet_count": str(i * 4),
        "hashtags": ["[election, news]", "[]", "", "[vote]"][i % 4],
        "urls": "[https://example.org/a, https://example.org/b]" if i % 2 == 0 else "[]",
        "user_mentions": f"[{i}00, {i}01]" if i % 3 == 0 else "",
        "poll_choices": "",
    }


def write_fixture(dirpath: str) -> tuple[str, str]:
    """Write tweets.csv + tweets.schema; return their paths."""
    os.makedirs(dirpath, exist_ok=True)
    csv_path = os.path.join(dirpath, "tweets.csv")
    schema_path = os.path.join(dirpath, "tweets.schema")
    names = [n for n, _ in COLUMNS]
    rows = [_row(i, t) for i, t in enumerate(VALID_TIMES)]
    rows += [_row(100 + j, t) for j, t in enumerate(CORRUPT_TIMES)]
    with open(csv_path, "w", newline="", encoding="utf-8") as fh:
        w = csv.DictWriter(fh, fieldnames=names, quoting=csv.QUOTE_ALL, doublequote=True)
        w.writeheader()
        w.writerows(rows)
    with open(schema_path, "w", encoding="utf-8") as fh:
        fh.write("# tweets fixture schema\n# name=Type, order matches CSV\n")
        for n, t in COLUMNS:
            fh.write(f"{n}={t}\n")
    return csv_path, schema_path


N_VALID = len(VALID_TIMES)
N_CORRUPT = len(CORRUPT_TIMES)
N_COLUMNS = len(COLUMNS)
