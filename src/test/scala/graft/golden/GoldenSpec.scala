package graft.golden

import graft.SparkSpec

/** Curated slice of the reference's own stateless golden tests
  * (`/root/reference/tests/queries/0_stateless/`): each `.sql` file runs
  * through the ChSql dialect shim and its CH-TSV-formatted output must
  * equal the paired `.reference` file byte-for-byte. This is the
  * reference's primary test asset (SURVEY §5) re-targeted at this engine;
  * the list below is every file from the ~470 SELECT-only candidates that
  * exercises semantics this engine reproduces exactly (124 files covering
  * array ops, higher-order functions, UNION ALL forms, string/regexp
  * functions, aggregation-in-subquery shapes, escape handling, hex/unhex,
  * splitBy*, factorial, IN-tuple comparisons, date arithmetic, CASE,
  * sorting, and parser edge cases). Curation criteria: no DDL/system
  * tables, deterministic output, and no dependence on CH-only type-width
  * inference (Int8 overflow wrapping, FixedString padding, toTypeName).
  */
class GoldenSpec extends SparkSpec {

  private val base = "/root/reference/tests/queries/0_stateless"

  private val files = Seq(
    "00691_array_distinct.sql",
    "01199_url_functions_path_without_schema_yiurule.sql",
    "00012_array_join_alias_2.sql",
    "00023_agg_select_agg_subquery.sql",
    "00024_unused_array_join_in_subquery.sql",
    "01680_predicate_pushdown_union_distinct_subquery.sql",
    "00582_not_aliasing_functions.sql",
    "00591_columns_removal_union_all.sql",
    "00836_numbers_table_function_zero.sql",
    "00967_ubsan_bit_test.sql",
    "00994_table_function_numbers_mt.sql",
    "01051_scalar_optimization.sql",
    "01065_array_zip_mixed_const.sql",
    "01092_base64.sql",
    "01116_cross_count_asterisks.sql",
    "01248_least_greatest_mixed_const.sql",
    "01417_update_permutation_crash.sql",
    "02113_base64encode_trailing_bytes_1.sql",
    "02131_remove_columns_in_subquery.sql",
    "02265_cross_join_empty_list.sql",
    "02353_ascii.sql",
    "02364_window_case.sql",
    "02467_cross_join_three_table_functions.sql",
    "02494_analyzer_cte_resolution_in_subquery_fix.sql",
    "02515_distinct_zero_size_key_bug_44831.sql",
    "00479_date_and_datetime_to_number.sql",
    "00001_select_1.sql",
    "00008_array_join.sql",
    "00009_array_join_subquery.sql",
    "00018_distinct_in_subquery.sql",
    "00020_sorting_arrays.sql",
    "00021_sorting_arrays.sql",
    "00022_func_higher_order_and_constants.sql",
    "00025_implicitly_used_subquery_column.sql",
    "00060_date_lut.sql",
    "00072_in_types.sql",
    "00098_6_union_all.sql",
    "00098_7_union_all.sql",
    "00098_8_union_all.sql",
    "00098_9_union_all.sql",
    "00098_a_union_all.sql",
    "00098_b_union_all.sql",
    "00098_g_union_all.sql",
    "00098_h_union_all.sql",
    "00114_float_type_result_of_division.sql",
    "00125_array_element_of_array_of_tuple.sql",
    "00131_set_hashed.sql",
    "00144_empty_regexp.sql",
    "00145_empty_likes.sql",
    "00151_tuple_with_array.sql",
    "00156_array_map_to_constant.sql",
    "00157_aliases_and_lambda_formal_parameters.sql",
    "00174_compare_date_time_with_constant_string_in_in.sql",
    "00187_like_regexp_prefix.sql",
    "00204_extract_url_parameter.sql",
    "00218_like_regexp_newline.sql",
    "00320_between.sql",
    "00333_parser_number_bug.sql",
    "00369_int_div_of_float.sql",
    "00389_concat_operator.sql",
    "00404_null_literal.sql",
    "00464_sort_all_constant_columns.sql",
    "00466_comments_in_keyword.sql",
    "00516_modulo.sql",
    "00518_extract_all_and_empty_matches.sql",
    "00592_union_all_different_aliases.sql",
    "00624_length_utf8.sql",
    "00680_duplicate_columns_inside_union_all.sql",
    "00701_context_use_after_free.sql",
    "00727_concat.sql",
    "00752_low_cardinality_array_result.sql",
    "00756_power_alias.sql",
    "00761_lower_utf8_bug.sql",
    "00814_parsing_ub.sql",
    "00834_date_datetime_cmp.sql",
    "00906_low_cardinality_const_argument.sql",
    "00968_roundAge.sql",
    "00969_roundDuration.sql",
    "00997_extract_all_crash_6627.sql",
    "01020_function_array_compact.sql",
    "01020_having_without_group_by.sql",
    "01072_select_constant_limit.sql",
    "01086_modulo_or_zero.sql",
    "01100_split_by_string.sql",
    "01117_greatest_least_case.sql",
    "01247_least_greatest_filimonov.sql",
    "01312_case_insensitive_regexp.sql",
    "01326_hostname_alias.sql",
    "01328_bad_peephole_optimization.sql",
    "01352_add_datetime_bad_get.sql",
    "01491_nested_multiline_comments.sql",
    "01513_ilike_like_cache.sql",
    "01655_quarter_modificator_for_formatDateTime.sql",
    "01655_test_isnull_mysql_dialect.sql",
    "01656_test_hex_mysql_dialect.sql",
    "01657_test_toHour_mysql_compatibility.sql",
    "01660_test_toDayOfYear_mysql_compatibility.sql",
    "01662_test_toDayOfMonth_mysql_compatibility.sql",
    "01663_test_toDate_mysql_compatibility.sql",
    "01668_test_toMonth_mysql_dialect.sql",
    "01669_test_toYear_mysql_dialect.sql",
    "01670_test_repeat_mysql_dialect.sql",
    "01671_test_toQuarter_mysql_dialect.sql",
    "01672_test_toSecond_mysql_dialect.sql",
    "01673_test_toMinute_mysql_dialect.sql",
    "01711_decimal_multiplication.sql",
    "01720_union_distinct_with_limit.sql",
    "01773_case_sensitive_version.sql",
    "01812_has_generic.sql",
    "01818_case_float_value_fangyc.sql",
    "01820_unhex_case_insensitive.sql",
    "01866_split_by_regexp.sql",
    "01960_lambda_precedence.sql",
    "02020_cast_integer_overflow.sql",
    "02150_replace_regexp_all_empty_match.sql",
    "02185_split_by_char.sql",
    "02313_cross_join_dup_col_names.sql",
    "02316_const_string_intersact.sql",
    "02316_literal_no_octal.sql",
    "02316_values_table_func_bug.sql",
    "02580_like_substring_search_bug.sql",
    "02680_instr_alias_for_position_case_insensitive.sql",
    "02700_regexp_operator.sql",
    "02751_match_constant_needle.sql")

  files.foreach { f =>
    test(s"golden: $f") {
      val (actual, expected) =
        Golden.runFile(spark, s"$base/$f", SparkSpec.tiny)
      assert(actual == expected,
        s"\n--- got ---\n${actual.mkString("\n")}\n--- want ---\n${expected.mkString("\n")}")
    }
  }
}
