package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phone-number normalization to international format.
  *
  * Re-expresses the reference's `parse_phone_number`
  * (`/root/reference/insert.py:28-67`) as a pure `Column` expression chain:
  * no UDF, so the whole transform stays inside whole-stage codegen and is
  * expressible in the DuckDB oracle. Branch-for-branch semantics:
  *
  *  1. stringify; `'.'→'-'`, `')'→'-'`, drop `'('`        (insert.py:34-35)
  *  2. split on `'x'`: base = part 0, extension = part 1  (insert.py:37-38)
  *  3. base split on `'-'` == 3 parts → `"+1 {base}"`     (insert.py:43-45)
  *  4. 4 parts with part0 ∈ {001, +1} → `"+1 p1-p2-p3"`   (insert.py:46-47)
  *  5. whole cleaned string (INCLUDING extension) length 10, not starting
  *     '0' → `"+1 xxx-xxx-xxxx"` — overrides 3-4          (insert.py:49-50)
  *  6. length 9 → `"+33 x xx xx xx xx"` — overrides all   (insert.py:52-54)
  *  7. re-append `"x{extension}"`                          (insert.py:57-58)
  *  8. validity: the reference calls libphonenumber's `is_possible_number`
  *     (insert.py:60-67); for the only two regions this code can emit that
  *     reduces to an NSN length check (US: 10, FR: 9). With the country
  *     digits that is exactly 11 digits before the extension marker in both
  *     cases. Impossible or empty → NULL.
  *
  * Known divergences (documented, covered by unit tests):
  *  - null input → NULL (the reference stringifies NaN to "nan", which then
  *    also fails validation → None; observable behavior identical);
  *  - pathological non-digit extensions (e.g. "x8-9") pass our digit-count
  *    validation but may fail libphonenumber's extension grammar.
  *
  * Scale: pure expression → codegen'd, partition-local, zero shuffle.
  */
object Phone {

  /** International normalization; returns NULL for invalid numbers. */
  def normalize(phoneRaw: Column): Column = {
    val cleaned  = translate(phoneRaw.cast("string"), ".)(", "--")
    val extParts = split(cleaned, "x")
    val base     = get(extParts, lit(0))
    val hasExt   = size(extParts) > 1
    val ext      = coalesce(get(extParts, lit(1)), lit(""))

    val parts = split(base, "-")
    val p = (i: Int) => get(parts, lit(i))

    val us3  = concat(lit("+1 "), base)
    val us4  = concat(lit("+1 "), p(1), lit("-"), p(2), lit("-"), p(3))
    val us10 = concat(lit("+1 "),
      substring(cleaned, 1, 3), lit("-"),
      substring(cleaned, 4, 3), lit("-"),
      substring(cleaned, 7, 4))
    val fr9 = concat(lit("+33 "),
      substring(cleaned, 1, 1), lit(" "),
      substring(cleaned, 2, 2), lit(" "),
      substring(cleaned, 4, 2), lit(" "),
      substring(cleaned, 6, 2), lit(" "),
      substring(cleaned, 8, 2))

    // Later reference statements override earlier ones → highest-priority
    // branch first here (the length-9/10 branches are mutually exclusive).
    val intl =
      when(length(cleaned) === 9, fr9)
        .when(length(cleaned) === 10 && !cleaned.startsWith("0"), us10)
        .when(size(parts) === 3, us3)
        .when(size(parts) === 4 && (p(0) === "001" || p(0) === "+1"), us4)
        .otherwise(lit(""))

    val withExt = when(hasExt, concat(intl, lit("x"), ext)).otherwise(intl)

    // is_possible_number reduced to NSN-length (see scaladoc step 8):
    // "+1" + 10 NSN digits == "+33" + 9 NSN digits == 11 digits total
    // before the extension marker.
    val nsnDigits =
      length(regexp_replace(get(split(withExt, "x"), lit(0)), "[^0-9]", ""))
    when((withExt.startsWith("+1 ") || withExt.startsWith("+33 ")) &&
      nsnDigits === 11, withExt)
  }
}
