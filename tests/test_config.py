from __future__ import annotations

import datetime as dt

from hivetomysql_spark.config import (
    DumpConf,
    DumpMap,
    java_date_format_to_strftime,
    parse_properties,
    yesterday_ds,
)

CONF_TEXT = """
# pipeline config (reference dump.conf shape)
hive_db=dm
hive_table=events
ds=?
ds_formater=yyyy-MM-dd
mysql_ip=127.0.0.1
mysql_port=3306
mysql_db=report
mysql_table=events_daily
mysql_user=u
mysql_password=p
delete_before_dump=true
error_if_none_data=true
error_if_src_field_not_exsits=false
mode=test
"""

MAP_TEXT = """
etype=event_type
uid=user_id
amount=value
ds=$ds
version=#2.0
"""


def test_parse_properties_skips_comments_and_blanks():
    props = parse_properties("# c\n\na=1\n! also comment\nb = x=y \n")
    assert props == {"a": "1", "b": "x=y"}


def test_java_date_format():
    assert java_date_format_to_strftime("yyyyMMdd") == "%Y%m%d"
    assert java_date_format_to_strftime("yyyy-MM-dd") == "%Y-%m-%d"


def test_yesterday_ds():
    assert yesterday_ds("yyyyMMdd", today=dt.date(2024, 3, 1)) == "20240229"


def test_conf_resolves_question_mark_ds():
    conf = DumpConf.from_text(CONF_TEXT, today=dt.date(2024, 1, 2))
    assert conf.ds == "2024-01-01"
    assert conf.delete_before_dump is True
    assert conf.error_if_none_data is True
    assert conf.error_if_src_field_not_exsits is False
    assert conf.mode == "test"
    assert conf.jdbc_url == "jdbc:mysql://127.0.0.1:3306/report"


def test_conf_explicit_ds_kept():
    conf = DumpConf.from_text("ds=20240105\n")
    assert conf.ds == "20240105"


def test_map_classifies_rename_var_literal():
    conf = DumpConf.from_text(CONF_TEXT, today=dt.date(2024, 1, 2))
    mapping = DumpMap.from_text(MAP_TEXT, conf=conf)
    assert mapping.target_names == ["etype", "uid", "amount", "ds", "version"]
    assert mapping.mapped_sources == ["event_type", "user_id", "value"]
    assert mapping.constant_fields == {"ds": "2024-01-01", "version": "2.0"}
