package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{PromRemoteCodec, ProtoWire}
import graft.ingest.PromRemoteCodec.{PromLabel, PromSample, PromTimeSeries, PromWriteRequest}
import graft.operators.{LabelMatcher, MatcherType, ReadQuery}
import graft.serve.PromQL

/** Deterministic fuzz of the hand-rolled proto wire codec — a
  * server-facing decoder must round-trip arbitrary field content
  * (unicode, empty strings, NaN/±Inf, extreme int64) and fail with
  * ONLY WireFormatException-class errors on garbage bytes, never
  * with array/offset errors that would crash the serving loop.
  * Seeded Random keeps every run identical (no scalacheck shrinkage
  * nondeterminism in CI). */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new Random(42)

  private def randString(): String = {
    val n = rnd.nextInt(12)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 => sb += (rnd.nextInt(26) + 'a').toChar
        case 1 => sb += (rnd.nextInt(0x7ff - 0x80) + 0x80).toChar // 2-byte utf8
        case 2 => sb += (rnd.nextInt(0xd7ff - 0x800) + 0x800).toChar // 3-byte utf8
        case 3 => sb += "=,; \t\"'\\".charAt(rnd.nextInt(8))
      }
    }
    sb.result()
  }

  private def randDouble(): Double = rnd.nextInt(6) match {
    case 0 => Double.NaN
    case 1 => Double.PositiveInfinity
    case 2 => Double.NegativeInfinity
    case 3 => -0.0
    case 4 => java.lang.Double.longBitsToDouble(rnd.nextLong())
    case _ => rnd.nextDouble() * 1e6 - 5e5
  }

  private def randLong(): Long = rnd.nextInt(4) match {
    case 0 => Long.MaxValue - rnd.nextInt(10)
    case 1 => Long.MinValue + rnd.nextInt(10)
    case 2 => rnd.nextLong()
    case _ => rnd.nextInt(1 << 20).toLong
  }

  private def bitsEq(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)

  test("WriteRequest round-trips 300 randomized messages bit-exactly") {
    (1 to 300).foreach { _ =>
      val req = PromWriteRequest((0 until rnd.nextInt(4)).map { _ =>
        PromTimeSeries(
          (0 until rnd.nextInt(5)).map(_ => PromLabel(randString(), randString())),
          (0 until rnd.nextInt(6)).map(_ => PromSample(randDouble(), randLong())))
      })
      val back = PromRemoteCodec.decodeWriteRequest(PromRemoteCodec.encodeWriteRequest(req))
      assert(back.timeseries.size == req.timeseries.size)
      back.timeseries.zip(req.timeseries).foreach { case (b, a) =>
        assert(b.labels == a.labels)
        assert(b.samples.size == a.samples.size)
        b.samples.zip(a.samples).foreach { case (bs, as) =>
          assert(bs.timestampMs == as.timestampMs)
          assert(bitsEq(bs.value, as.value), s"${bs.value} vs ${as.value}")
        }
      }
    }
  }

  test("ReadRequest round-trips 300 randomized query sets") {
    val types = Seq(MatcherType.Eq, MatcherType.Neq, MatcherType.Re, MatcherType.Nre)
    (1 to 300).foreach { _ =>
      val qs = (0 until rnd.nextInt(3) + 1).map { _ =>
        ReadQuery(
          math.abs(randLong() % (1L << 40)), math.abs(randLong() % (1L << 40)),
          (0 until rnd.nextInt(4)).map(_ =>
            LabelMatcher(types(rnd.nextInt(4)), randString(), randString())),
          stepMs = rnd.nextInt(1 << 20).toLong)
      }
      val back = PromRemoteCodec.decodeReadRequest(PromRemoteCodec.encodeReadRequest(qs))
      assert(back.map(q => (q.startMs, q.endMs, q.matchers, q.stepMs)) ==
             qs.map(q => (q.startMs, q.endMs, q.matchers, q.stepMs)))
    }
  }

  test("ReadResponse round-trips randomized series") {
    (1 to 100).foreach { _ =>
      val series = (0 until rnd.nextInt(4)).map { _ =>
        PromTimeSeries(
          (0 until rnd.nextInt(4)).map(_ => PromLabel(randString(), randString())),
          (0 until rnd.nextInt(5)).map(_ => PromSample(randDouble(), randLong())))
      }
      val back = PromRemoteCodec.decodeReadResponse(PromRemoteCodec.encodeReadResponse(series))
      assert(back.size == series.size)
      back.zip(series).foreach { case (b, a) =>
        assert(b.labels == a.labels)
        assert(b.samples.map(_.timestampMs) == a.samples.map(_.timestampMs))
        b.samples.zip(a.samples).foreach { case (bs, as) => assert(bitsEq(bs.value, as.value)) }
      }
    }
  }

  test("TabSeparated escaping round-trips adversarial strings and arrays") {
    import graft.ingest.TsvBulk
    (1 to 500).foreach { _ =>
      val s = randString() + (if (rnd.nextBoolean()) "\n\r" else "")
      assert(TsvBulk.unescape(TsvBulk.escape(s, quote = false)) == s)
      val arr = (0 until rnd.nextInt(5)).map(_ => randString() + "\t\n")
      val enc = arr.map(e => "'" + TsvBulk.escape(e, quote = true) + "'").mkString("[", ",", "]")
      assert(TsvBulk.parseArray(enc) == arr)
    }
    // the aliasing case a plain "','" split mis-parses: content a','b
    // encodes to a\',\'b whose raw chars still contain ','
    assert(TsvBulk.parseArray("""['a\',\'b']""") == Seq("a','b"))
    assert(TsvBulk.parseArray("['a','b']") == Seq("a", "b"))
    assert(TsvBulk.parseArray("[]") == Nil)
  }

  test("malformed TSV never escapes the codec's declared failure modes") {
    import graft.ingest.TsvBulk
    // same contract as the proto codec: garbage input fails with
    // IllegalArgumentException-class errors only — an index error
    // would abort a whole bulk-import job uncleanly
    def assertClean(f: => Any): Unit =
      try { f; () } catch {
        case _: IllegalArgumentException => () // incl. NumberFormatException
        case t: Throwable => fail(s"TSV codec leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    (1 to 500).foreach { _ =>
      assertClean(TsvBulk.parseArray(randString()))
      // truncations of a valid encoding (the crash-mid-write case)
      val valid = Seq("a=1", "k='q'", "t=x\ty", "s=b\\k")
        .map(e => "'" + TsvBulk.escape(e, quote = true) + "'").mkString("[", ",", "]")
      assertClean(TsvBulk.parseArray(valid.substring(0, rnd.nextInt(valid.length))))
    }
  }

  test("truncated and bit-flipped VALID messages fail cleanly too") {
    // different failure paths than pure garbage: a truncated valid
    // message exercises every length-prefix boundary (crash
    // mid-transfer), a bit-flip exercises field-tag and varint
    // corruption (a flip can also land in string content and still
    // decode — success is legal, leaking index errors is not)
    def assertClean(f: => Any): Unit =
      try { f; () } catch {
        case _: ProtoWire.WireFormatException => ()
        case _: java.io.IOException => ()
        case _: IllegalArgumentException => ()
        case t: Throwable => fail(s"codec leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    (1 to 300).foreach { _ =>
      val req = PromWriteRequest((0 until rnd.nextInt(3) + 1).map { _ =>
        PromTimeSeries(
          (0 until rnd.nextInt(4)).map(_ => PromLabel(randString(), randString())),
          (0 until rnd.nextInt(5)).map(_ => PromSample(randDouble(), randLong())))
      })
      val enc = PromRemoteCodec.encodeWriteRequest(req)
      assertClean(PromRemoteCodec.decodeWriteRequest(
        enc.take(rnd.nextInt(enc.length))))
      val flipped = enc.clone()
      val i = rnd.nextInt(flipped.length)
      flipped(i) = (flipped(i) ^ (1 << rnd.nextInt(8))).toByte
      assertClean(PromRemoteCodec.decodeWriteRequest(flipped))
    }
  }

  test("the selector parser never throws; round-trips every structured selector") {
    val rnd2 = new Random(4242)
    def randSel(): String = {
      val sb = new StringBuilder
      if (rnd2.nextBoolean()) sb ++= ("m" + rnd2.nextInt(100))
      if (rnd2.nextBoolean() || sb.isEmpty) {
        sb += '{'
        val n = rnd2.nextInt(4)
        (0 until n).foreach { i =>
          if (i > 0) sb += ','
          sb ++= s"k${rnd2.nextInt(10)}"
          sb ++= Seq("=", "!=", "=~", "!~")(rnd2.nextInt(4))
          sb += '"'
          // escaped content only — quotes/backslashes always escaped
          (0 until rnd2.nextInt(6)).foreach { _ =>
            rnd2.nextInt(4) match {
              case 0 => sb ++= "\\\""
              case 1 => sb ++= "\\\\"
              case 2 => sb += (rnd2.nextInt(26) + 'a').toChar
              case 3 => sb += (rnd2.nextInt(10) + '0').toChar
            }
          }
          sb += '"'
        }
        sb += '}'
      }
      sb.result()
    }
    (0 until 500).foreach { _ =>
      val sel = randSel()
      val parsed = graft.operators.Matchers.parseSelector(sel) // must not throw
      // every generated selector is well-formed except the bare "{}"
      // (no name, no matchers) and the empty string
      val wellFormed = sel.nonEmpty && sel != "{}"
      assert(parsed.isDefined == wellFormed, s"selector <$sel> parsed=$parsed")
    }
    // arbitrary garbage: never throws, just None or Some
    val chars = "mk{}=!~\"',_0a \t\""
    (0 until 2000).foreach { _ =>
      val g = (0 until rnd2.nextInt(16)).map(_ => chars.charAt(rnd2.nextInt(chars.length))).mkString
      graft.operators.Matchers.parseSelector(g) // must not throw
    }
  }

  test("the PromQL parser never throws: structured expressions and garbage") {
    val rnd3 = new Random(1313)
    val fns = Seq("rate", "irate", "increase", "delta", "idelta", "deriv",
      "changes", "resets", "sum_over_time", "avg_over_time", "min_over_time",
      "max_over_time", "count_over_time", "last_over_time",
      "stddev_over_time", "mad_over_time", "present_over_time")
    val aggs = Seq("sum", "avg", "min", "max", "count", "group",
      "stddev", "stdvar")
    val maths = Seq("abs", "ceil", "floor", "sgn")
    def randExpr(depth: Int): String = {
      if (depth <= 0) s"m${rnd3.nextInt(10)}"
      else rnd3.nextInt(14) match {
        case 0 => s"${fns(rnd3.nextInt(fns.length))}(m${rnd3.nextInt(10)}[${1 + rnd3.nextInt(120)}m])"
        case 1 => s"${aggs(rnd3.nextInt(aggs.length))} by (k${rnd3.nextInt(5)}) (${randExpr(depth - 1)})"
        case 2 => s"${aggs(rnd3.nextInt(aggs.length))} without (k${rnd3.nextInt(5)}) (${randExpr(depth - 1)})"
        case 3 => s"topk(${1 + rnd3.nextInt(5)}, ${randExpr(depth - 1)})"
        case 4 => s"${maths(rnd3.nextInt(maths.length))}(${randExpr(depth - 1)})"
        case 5 =>
          val op = "+-*/%".charAt(rnd3.nextInt(5))
          s"(${randExpr(depth - 1)}) $op (${randExpr(depth - 1)})"
        case 6 =>
          val op = Seq("==", "!=", "<", "<=", ">", ">=")(rnd3.nextInt(6))
          s"${randExpr(depth - 1)} $op ${rnd3.nextInt(100)}"
        case 7 =>
          val op = Seq("and", "or", "unless")(rnd3.nextInt(3))
          s"(${randExpr(depth - 1)}) $op (${randExpr(depth - 1)})"
        case 8 => s"clamp(${randExpr(depth - 1)}, 0, ${1 + rnd3.nextInt(100)})"
        case 9 => s"max_over_time((${randExpr(depth - 1)})[1h:${1 + rnd3.nextInt(30)}m])"
        case 10 => s"(${randExpr(depth - 1)}) ^ ${rnd3.nextInt(9)}"
        case 11 => s"limitk(${1 + rnd3.nextInt(5)}, ${randExpr(depth - 1)})"
        case 12 => s"limit_ratio(${Seq("0.5", "-0.5", "1.0", "0.25")(rnd3.nextInt(4))}, ${randExpr(depth - 1)})"
        case 13 =>
          val at = Seq("start()", "end()", "1704412800")(rnd3.nextInt(3))
          s"sum_over_time(m${rnd3.nextInt(10)}[${1 + rnd3.nextInt(60)}m] @ $at)"
      }
    }
    // every structured expression parses (the generator stays inside
    // the documented grammar)
    (0 until 500).foreach { _ =>
      val q = randExpr(1 + rnd3.nextInt(3))
      assert(PromQL.parse(q).isRight, s"should parse: $q")
    }
    // arbitrary garbage: Left with a message, never a throw
    val chars = "mk{}()[]=!~<>\"',:._ +-*/0123456789abdorstu\t"
    (0 until 5000).foreach { _ =>
      val g = (0 until rnd3.nextInt(24))
        .map(_ => chars.charAt(rnd3.nextInt(chars.length))).mkString
      PromQL.parse(g) // must not throw
    }
  }

  test("garbage bytes never escape the codec's declared failure modes") {
    // acceptable: clean wire/format errors (mapped to the reference's
    // HTTP 400/500 path). NOT acceptable: index/negative-size/OOM-class
    // errors — those would kill the serving loop on hostile input.
    def assertClean(f: => Any): Unit =
      try { f; () } catch {
        case _: ProtoWire.WireFormatException => ()
        case _: java.io.IOException => () // snappy: failed to uncompress
        case _: IllegalArgumentException => ()
        case t: Throwable => fail(s"codec leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    (1 to 500).foreach { _ =>
      val raw = Array.fill(rnd.nextInt(80))(rnd.nextInt(256).toByte)
      assertClean(PromRemoteCodec.decodeWriteRequest(raw))
      assertClean(PromRemoteCodec.decodeReadRequest(raw))
      assertClean(PromRemoteCodec.decodeReadResponse(raw))
      // valid snappy frame wrapping garbage proto bytes
      val framed = org.xerial.snappy.Snappy.compress(raw)
      assertClean(PromRemoteCodec.decodeWriteRequest(framed))
      assertClean(PromRemoteCodec.decodeReadRequest(framed))
      assertClean(PromRemoteCodec.decodeReadResponse(framed))
    }
  }
}
