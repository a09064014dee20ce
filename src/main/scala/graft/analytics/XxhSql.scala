package graft.analytics

/** DuckDB-SQL replay of Spark's `xxhash64` (XXH64, seed 42) for SHORT
  * ASCII strings (< 32 bytes — only the tail path) and the two-arg
  * `xxhash64(string, int)` chain (the int is hashed through XXH64's
  * 4-byte finalizer with the string's hash as seed — pinned
  * empirically against Spark in tools/XxhProbe, all tokens exact).
  *
  * This closes the "engine-hash placements no SQL engine reproduces"
  * oracle class for BOUNDED-vocabulary relations: 64-bit wraparound
  * multiplication is spelled as 32-bit limb products in HUGEINT (a
  * full 64×64 product overflows INT128), rotations as shift-add (the
  * two halves cannot overlap), and Spark's signed `pmod(h, width)`
  * equals unsigned `h % width` whenever width divides 2^64 — so the
  * whole CountMin placement chain is pure SQL arithmetic. Cost is
  * O(distinct tokens), fixture-bounded; at corpus vocabulary scale
  * this oracle is not the tool — the sketch suites are.
  */
object XxhSql {

  private val M = "18446744073709551616" // 2^64
  private val M32 = "4294967296"
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  /** (a·b) mod 2^64 via 32-bit limbs; intermediates < 2^66 in HUGEINT. */
  private def mul(a: String, b: String): String =
    s"""CAST(((CAST(($a) % $M32 AS HUGEINT) * (($b) % $M32))
       | + ((CAST(($a) % $M32 AS HUGEINT) * (($b) >> 32)
       |     + CAST(($a) >> 32 AS HUGEINT) * (($b) % $M32)) % $M32) * $M32)
       | % $M AS UBIGINT)""".stripMargin.replace("\n", " ")

  private def add(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $M AS UBIGINT)"

  /** Left-rotate: the shifted-out high bits land in the low bits the
    * multiply left zero — no overlap, plain + is exact.
    */
  private def rotl(x: String, r: Int): String =
    s"(CAST((CAST($x AS HUGEINT) * ${1L << r}) % $M AS UBIGINT) + (($x) >> ${64 - r}))"

  private def xr(a: String, b: String): String =
    s"xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT))"

  private def u(x: String): String = s"CAST($x AS UBIGINT)"

  /** CTE chain hashing a `(tok)` relation named `$src` (ASCII, < 32
    * bytes) to `xh_h1(tok, h1)` — h1 is Spark `xxhash64(tok)` as
    * UBIGINT.
    */
  def h1Ctes(src: String): String =
    s"""xh_b AS (SELECT tok, strlen(tok) n,
       |        list_transform(range(strlen(tok)),
       |          i -> CAST(ascii(substr(tok, CAST(i+1 AS INT), 1)) AS UBIGINT)) bs
       |      FROM $src),
       |xh_s0 AS (SELECT tok, n, bs,
       |        ${add(add(u("42"), u(P5)), "n")} acc0,
       |        CASE WHEN n >= 8 THEN bs[1]+bs[2]*256+bs[3]*65536+bs[4]*16777216
       |          +bs[5]*4294967296+bs[6]*1099511627776+bs[7]*281474976710656
       |          +bs[8]*72057594037927936 ELSE CAST(0 AS UBIGINT) END lane8
       |      FROM xh_b),
       |xh_s1 AS (SELECT tok, n, bs, acc0,
       |        CASE WHEN n >= 8 THEN ${mul("k27", u(P1))} ELSE acc0 END acc1a,
       |        CASE WHEN n >= 8 THEN 8 ELSE 0 END i1
       |      FROM (SELECT *, ${rotl(xr("acc0", "kk"), 27)} k27 FROM
       |        (SELECT *, ${mul(rotl(mul("lane8", u(P2)), 31), u(P1))} kk FROM xh_s0))),
       |xh_s1b AS (SELECT tok, n, bs,
       |        CASE WHEN n >= 8 THEN ${add("acc1a", u(P4))} ELSE acc1a END acc1, i1
       |      FROM xh_s1),
       |xh_s2 AS (SELECT tok, n, bs, i1, acc1,
       |        CASE WHEN n - i1 >= 4 THEN bs[i1+1]+bs[i1+2]*256+bs[i1+3]*65536
       |          +bs[i1+4]*16777216 ELSE CAST(0 AS UBIGINT) END lane4
       |      FROM xh_s1b),
       |xh_s3 AS (SELECT tok, n, bs,
       |        CASE WHEN n - i1 >= 4 THEN ${add(mul("r23", u(P2)), u(P3))} ELSE acc1 END acc2,
       |        CASE WHEN n - i1 >= 4 THEN i1 + 4 ELSE i1 END i2
       |      FROM (SELECT *, ${rotl(xr("acc1", mul("lane4", u(P1))), 23)} r23 FROM xh_s2)),
       |xh_s4 AS (SELECT tok, n,
       |        list_reduce(list_prepend(acc2, bs[i2+1:n]),
       |          (acc, byte) -> ${mul(rotl(xr("acc", mul("byte", u(P5))), 11), u(P1))}) acc3
       |      FROM xh_s3),
       |xh_s5 AS (SELECT tok, ${mul(xr("acc3", "acc3 >> 33"), u(P2))} a FROM xh_s4),
       |xh_s6 AS (SELECT tok, ${mul(xr("a", "a >> 29"), u(P3))} a FROM xh_s5),
       |xh_h1 AS (SELECT tok, xor(a, a >> 32) h1 FROM xh_s6)""".stripMargin

  /** CTE chaining `xh_h1` through Spark's second-arg INT hash for
    * d ∈ [0, depth) → `xh_bk(tok, d, bucket)` with
    * bucket = pmod(xxhash64(tok, d), width). Width must divide 2^64.
    */
  def bucketCtes(depth: Int, width: Int): String = {
    require(Integer.bitCount(width) == 1,
      s"width=$width must be a power of two for the unsigned-mod identity")
    s"""xh_hd AS (SELECT tok, h1, CAST(dd AS UBIGINT) d
       |      FROM xh_h1 CROSS JOIN (SELECT unnest(range($depth)) dd)),
       |xh_c1 AS (SELECT tok, d,
       |        ${rotl(xr(add(add("h1", u(P5)), u("4")), mul("d", u(P1))), 23)} acc
       |      FROM xh_hd),
       |xh_c2 AS (SELECT tok, d, ${add(mul("acc", u(P2)), u(P3))} a FROM xh_c1),
       |xh_f1 AS (SELECT tok, d, ${mul(xr("a", "a >> 33"), u(P2))} a FROM xh_c2),
       |xh_f2 AS (SELECT tok, d, ${mul(xr("a", "a >> 29"), u(P3))} a FROM xh_f1),
       |xh_bk AS (SELECT tok, CAST(d AS INT) d,
       |        CAST(xor(a, a >> 32) % $width AS BIGINT) bucket FROM xh_f2)""".stripMargin
  }

  /** The full q184 oracle: CountMin cell placement + min-of-rows
    * estimate, replayed from pure arithmetic.
    */
  def q184Oracle(probeTerms: Seq[String], depth: Int, width: Int): String = {
    val probeList = probeTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH occ AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) cnt
       |  FROM (SELECT source, unnest(string_split(text, ' ')) tok FROM documents)
       |  WHERE tok <> '' GROUP BY source, tok),
       |xh_toks AS (SELECT DISTINCT tok FROM occ
       |            UNION SELECT unnest([$probeList]) tok),
       |${h1Ctes("xh_toks")},
       |${bucketCtes(depth, width)},
       |cells AS (SELECT o.source, k.d, k.bucket, CAST(sum(o.cnt) AS BIGINT) cnt
       |          FROM occ o JOIN xh_bk k USING (tok) GROUP BY 1, 2, 3),
       |probes AS (SELECT s.source, p.tok
       |           FROM (SELECT DISTINCT source FROM occ) s
       |           CROSS JOIN (SELECT unnest([$probeList]) tok) p),
       |est AS (SELECT pr.source, pr.tok,
       |          min(coalesce(c.cnt, 0)) est
       |        FROM probes pr
       |        JOIN xh_bk k ON pr.tok = k.tok
       |        LEFT JOIN cells c ON c.source = pr.source AND c.d = k.d
       |          AND c.bucket = k.bucket
       |        GROUP BY pr.source, pr.tok)
       |SELECT source, tok, CAST(est AS BIGINT) AS est FROM est
       |ORDER BY source, tok""".stripMargin
  }
}
