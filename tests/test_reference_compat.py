"""Reference-compatibility suite: run actual ClickHouse stateless tests
(`.sql` + `.reference` golden outputs) from the read-only reference tree
against this engine and compare output byte-for-byte in TabSeparated form —
the reference's own primary test tier (SURVEY.md §4).

Only a curated subset runs (features we implement, deterministic results).
Growing this list is the parity metric across rounds.
"""
import datetime
import decimal
import math
import os

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.sql.lexer import tokenize

REF_DIR = "/root/reference/tests/queries/0_stateless"

# Curated, known-deterministic cases (auto-triaged + verified green).
CASES = [
    "00001_select_1",
    "00007_array",
    "00008_array_join",
    "00009_array_join_subquery",
    "00015_totals_having_constants",
    "00016_totals_having_constants",
    "00018_distinct_in_subquery",
    "00023_agg_select_agg_subquery",
    "00024_unused_array_join_in_subquery",
    "00025_implicitly_used_subquery_column",
    "00027_distinct_and_order_by",
    "00035_function_array_return_type",
    "00038_totals_limit",
    "00041_aggregation_remap",
    "00042_set",
    "00044_sorting_by_string_descending",
    "00049_any_left_join",
    "00050_any_left_join",
    "00051_any_inner_join",
    "00052_all_left_join",
    "00053_all_inner_join",
    "00055_join_two_numbers",
    "00057_join_aliases",
    "00066_group_by_in",
    "00071_insert_fewer_columns",
    "00072_in_types",
    "00098_1_union_all",
    "00098_2_union_all",
    "00098_3_union_all",
    "00098_4_union_all",
    "00098_5_union_all",
    "00098_6_union_all",
    "00098_7_union_all",
    "00098_8_union_all",
    "00098_9_union_all",
    "00098_a_union_all",
    "00098_b_union_all",
    "00098_c_union_all",
    "00098_d_union_all",
    "00098_e_union_all",
    "00098_f_union_all",
    "00098_g_union_all",
    "00098_h_union_all",
    "00099_join_many_blocks_segfault",
    "00106_totals_after_having",
    "00114_float_type_result_of_division",
    "00122_join_with_subquery_with_subquery",
    "00127_group_by_concat",
    "00136_duplicate_order_by_elems",
    "00144_empty_regexp",
    "00159_whitespace_in_columns_list",
    "00164_not_chain",
    "00188_constants_as_arguments_of_aggregate_functions",
    "00202_cross_join",
    "00238_removal_of_temporary_columns",
    "00269_database_table_whitespace",
    "00272_union_all_and_in_subquery",
    "00320_between",
    "00330_view_subqueries",
    "00355_array_of_non_const_convertible_types",
    "00356_analyze_aggregations_and_union_all",
    "00389_concat_operator",
    "00404_null_literal",
    "00466_comments_in_keyword",
    "00470_identifiers_in_double_quotes",
    "00516_modulo",
    "00553_invalid_nested_name",
    "00562_rewrite_select_expression_with_union",
    "00582_not_aliasing_functions",
    "00592_union_all_different_aliases",
    "00593_union_all_assert_columns_removed",
    "00603_system_parts_nonexistent_database",
    "00633_func_or_in",
    "00647_select_numbers_with_offset",
    "00688_case_without_else",
    "00741_client_comment_multiline",
    "00753_with_with_single_alias",
    "00756_power_alias",
    "00814_parsing_ub",
    "00816_join_column_names_sarg",
    "00817_with_simple",
    "00832_storage_file_lock",
    "00834_not_between",
    "00836_numbers_table_function_zero",
    "00856_no_column_issue_4242",
    "00882_multiple_join_no_alias",
    "00964_os_thread_priority",
    "00994_table_function_numbers_mt",
    "00999_settings_no_extra_quotes",
    "01012_select_limit_x_0",
    "01020_having_without_group_by",
    "01051_same_name_alias_with_joins",
    "01051_scalar_optimization",
    "01072_select_constant_limit",
    "01091_query_profiler_does_not_hang",
    "01097_pre_limit",
    "01117_greatest_least_case",
    "01280_opencl_bitonic_order_by",
    "01284_view_and_extremes_bug",
    "01328_bad_peephole_optimization",
    "01457_compile_expressions_fuzzer",
    "01552_alter_name_collision",
    "01561_aggregate_functions_of_key_with_join",
    "01659_array_aggregation_ubsan",
    "01680_predicate_pushdown_union_distinct_subquery",
    "01711_cte_subquery_fix",
    "01720_engine_file_empty_if_not_exists",
    "01720_union_distinct_with_limit",
    "01772_intdiv_minus_one_ubsan",
    "01818_case_float_value_fangyc",
    "01832_memory_write_suffix",
    "01908_with_unknown_column",
    "02032_short_circuit_least_greatest_bug",
    "02096_join_unusual_identifier_begin",
    "02123_MySQLWire_regression",
    "02131_remove_columns_in_subquery",
    "02189_join_type_conversion",
    "02244_casewithexpression_return_type",
    "02267_insert_empty_data",
    "02316_literal_no_octal",
    "02321_nested_short_circuit_functions",
    "02364_window_case",
    # round 2: Decimal / FixedString / Date / Enum types
    "00700_decimal_in_keys",
    "00700_decimal_with_default_precision_and_scale",
    "00045_sorting_by_fixed_string_descending",
    "00060_date_lut",
    "00128_group_by_number_and_fixed_string",
    "00134_aggregation_by_fixed_string_of_size_1_2_4_8",
    "00436_fixed_string_16_comparisons",
    "00439_fixed_string_filter",
    "00479_date_and_datetime_to_number",
    "00069_date_arithmetic",
    "00173_compare_date_time_with_constant_string",
    "00174_compare_date_time_with_constant_string_in_in",
]

SKIP: set = set()


def split_statements(sql_text: str):
    """-> [(stmt_text, tokens, expects_error)]; expects_error is True when
    the reference annotates the statement with -- { serverError ... } /
    { clientError ... } (the reference runner's error-expectation syntax,
    tests/clickhouse-test)."""
    toks = tokenize(sql_text)
    stmts = []           # (tokens, end_pos) — end_pos = the ';' position
    buf_tokens = []
    for t in toks:
        if t.kind == "end":
            if buf_tokens:
                stmts.append((buf_tokens, t.pos))
            break
        if t.kind == "op" and t.text == ";":
            if buf_tokens:
                stmts.append((buf_tokens, t.pos))
                buf_tokens = []
        else:
            buf_tokens.append(t)
    out = []
    for k, (ts, hi) in enumerate(stmts):
        lo = ts[0].pos
        nxt = stmts[k + 1][0][0].pos if k + 1 < len(stmts) else len(sql_text)
        tail = sql_text[hi:nxt]
        expects_error = ("serverError" in tail or "clientError" in tail)
        out.append((sql_text[lo:hi].strip(), ts, expects_error))
    return out


def fmt_value(v):
    if v is None:
        return r"\N"
    if isinstance(v, (decimal.Decimal, datetime.date, datetime.datetime)):
        from clickhouse_tpu.core.typed import format_value
        return format_value(v)
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, list):
        return "[" + ",".join(fmt_array_elem(x) for x in v) + "]"
    if isinstance(v, str):
        # TabSeparated escaping (reference: SerializationString escapeString)
        return (v.replace("\\", "\\\\").replace("\t", "\\t")
                .replace("\n", "\\n").replace("\r", "\\r")
                .replace("\x00", "\\0"))
    return str(v)


def fmt_array_elem(x):
    if isinstance(x, str):
        return "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return fmt_value(x)


def run_case(name: str) -> None:
    sql_path = os.path.join(REF_DIR, name + ".sql")
    ref_path = os.path.join(REF_DIR, name + ".reference")
    with open(sql_path, encoding="utf-8", errors="surrogateescape") as f:
        sql_text = f.read()
    with open(ref_path, encoding="utf-8", errors="surrogateescape") as f:
        expected = f.read()
    sql_text = sql_text.replace("{CLICKHOUSE_DATABASE}", "default")

    s = ch.connect()
    s.execute("SET ignore_unknown_settings = 1")
    out_lines = []
    for stmt_text, toks, expects_error in split_statements(sql_text):
        first = toks[0]
        if first.is_kw("SET"):
            try:
                s.execute(stmt_text)
            except Exception:
                pass             # unknown reference settings: ignore
            continue
        if expects_error:
            try:
                s.execute(stmt_text)
            except Exception:
                pass             # error expected by the reference test
            continue
        res = s.execute(stmt_text)
        if res.column_names:
            for row in res.rows():
                out_lines.append("\t".join(fmt_value(v) for v in row))
            if res.totals is not None:
                out_lines.append("")
                trow = [res.totals[k][0] for k in res.totals]
                out_lines.append("\t".join(fmt_value(v) for v in trow))
    got = "\n".join(out_lines)
    if out_lines:
        got += "\n"
    assert got == expected, (f"{name} output mismatch:\n--- got ---\n{got}"
                             f"--- expected ---\n{expected}")


@pytest.mark.parametrize("name", [c for c in CASES if c not in SKIP])
def test_reference_case(name):
    run_case(name)
