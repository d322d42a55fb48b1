package graft.pipeline

/** A small VRL interpreter covering the subset the reference's own
  * pipeline tests exercise (pipeline/src/etl/processor/vrl_processor.rs,
  * pipeline/tests/pipeline.rs `- vrl:` cases): event paths, variables,
  * assignment, `del`, literals, object/array construction, `map_values`
  * with a closure, the bang type assertions, and a few scalar helpers.
  *
  * Result semantics match the reference's one-to-many contract
  * (etl/transform/transformer/greptime.rs): an object resolves to one
  * row; an array resolves to one row per element, each of which MUST be
  * an object (the error names the offending index and type); an empty
  * array resolves to zero rows.
  *
  * This is not the full VRL language — programs using unsupported
  * constructs fail AT COMPILE TIME with a clear message, never
  * silently misbehave.
  */
object MiniVrl {

  // ---- value model ------------------------------------------------------

  sealed trait V extends Serializable
  case object VNull extends V
  final case class VBool(b: Boolean) extends V
  final case class VInt(l: Long) extends V
  final case class VFloat(d: Double) extends V
  final case class VStr(s: String) extends V
  final case class VArr(items: Vector[V]) extends V
  /** Insertion-ordered object (VRL objects render sorted in the
    * reference wire format only at the edge; pipelines see order). */
  final case class VObj(fields: Vector[(String, V)]) extends V {
    def get(k: String): Option[V] = fields.collectFirst { case (`k`, v) => v }
    def updated(k: String, v: V): VObj =
      if (fields.exists(_._1 == k)) VObj(fields.map { case (n, o) => if (n == k) (n, v) else (n, o) })
      else VObj(fields :+ (k -> v))
    def removed(k: String): VObj = VObj(fields.filterNot(_._1 == k))
  }

  def typeName(v: V): String = v match {
    case VNull => "null"
    case _: VBool => "boolean"
    case _: VInt => "integer"
    case _: VFloat => "float"
    case _: VStr => "string"
    case _: VArr => "array"
    case _: VObj => "object"
  }

  // ---- AST --------------------------------------------------------------

  sealed trait Expr extends Serializable
  final case class Lit(v: V) extends Expr
  /** `.a.b` — empty path = the whole event. */
  final case class EventPath(path: Vector[String]) extends Expr
  final case class VarRef(name: String, path: Vector[String]) extends Expr
  final case class ObjLit(fields: Vector[(String, Expr)]) extends Expr
  final case class ArrLit(items: Vector[Expr]) extends Expr
  final case class Call(fn: String, args: Vector[Expr],
      closure: Option[(String, Vector[Stmt])]) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr

  sealed trait Stmt extends Serializable
  final case class AssignEvent(path: Vector[String], e: Expr) extends Stmt
  final case class AssignVar(name: String, e: Expr) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt

  final case class Program(stmts: Vector[Stmt]) extends Serializable

  // ---- tokenizer ---------------------------------------------------------

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(s: String) extends Tok
  private final case class TPunct(s: String) extends Tok
  private case object TNewline extends Tok

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    // bracket stack: newlines are statement separators at top level AND
    // inside '{' blocks (closure bodies are statement lists); they are
    // suppressed only inside '(' / '[' where an expression continues.
    // Without this, a multi-statement closure body glues onto the next
    // statement's leading event path via postfix '.'-chaining.
    var stack = List.empty[Char]
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c == '\n' || c == ';') {
        if (stack.isEmpty || stack.head == '{') out += TNewline
        i += 1
      } else if (c == ' ' || c == '\t' || c == '\r') i += 1
      else if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) {
            src(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case o => sb += o
            }
            i += 2
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException("vrl: unterminated string")
        i += 1
        out += TStr(sb.result())
      } else if (c.isDigit || (c == '-' && i + 1 < n && src(i + 1).isDigit &&
          // a minus is a sign only when it can't continue an expression
          (out.result().lastOption match {
            case Some(TNum(_)) | Some(TStr(_)) | Some(TIdent(_)) |
                 Some(TPunct(")")) | Some(TPunct("]")) | Some(TPunct("}")) => false
            case _ => true
          }))) {
        val s = i
        i += 1
        while (i < n && (src(i).isDigit || src(i) == '.') &&
          !(src(i) == '.' && i + 1 < n && !src(i + 1).isDigit)) i += 1
        out += TNum(src.substring(s, i))
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        var ident = src.substring(s, i)
        // merge '!' only for a bang-function call `array!(...)`; `a!= 1`
        // must tokenize as ident 'a' + punct '!=' (an inequality)
        if (i < n && src(i) == '!' && i + 1 < n && src(i + 1) == '(') {
          ident += "!"; i += 1
        }
        out += TIdent(ident)
      } else {
        if (c == '(' || c == '[' || c == '{') stack = c :: stack
        if (c == ')' || c == ']' || c == '}') stack = stack.drop(1)
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (two == "==" || two == "!=" || two == "->" || two == ">=" || two == "<=" || two == "&&" || two == "||") {
          out += TPunct(two); i += 2
        } else { out += TPunct(c.toString); i += 1 }
      }
    }
    out.result()
  }

  // ---- parser ------------------------------------------------------------

  /** Supported function names; anything else is a compile error. */
  private val Functions = Set(
    "del", "array!", "string!", "int!", "float!", "bool!", "object!",
    "to_string", "to_int", "to_float", "upcase", "downcase", "length",
    "merge", "push", "exists", "map_values", "contains", "starts_with",
    "ends_with", "replace", "split", "join", "abs", "floor", "ceil", "round",
    "now")

  def compile(src: String): Program = new Parser(tokenize(src)).program()

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    private def next(): Tok = { val t = toks(p); p += 1; t }
    private def skipNl(): Unit = while (peek.contains(TNewline)) p += 1
    private def expect(s: String): Unit = next() match {
      case TPunct(`s`) => ()
      case o => throw new IllegalArgumentException(s"vrl: expected '$s', got $o")
    }

    def program(): Program = {
      val stmts = Vector.newBuilder[Stmt]
      skipNl()
      while (peek.isDefined) {
        stmts += stmt()
        skipNl()
      }
      val out = stmts.result()
      if (out.isEmpty) throw new IllegalArgumentException("vrl: empty program")
      Program(out)
    }

    def stmt(): Stmt = {
      // lookahead for `lvalue = expr` (but not `==`)
      val save = p
      peek match {
        case Some(TPunct(".")) =>
          val path = eventPath()
          peek match {
            case Some(TPunct("=")) => next(); AssignEvent(path, expr())
            case _ => p = save; ExprStmt(expr())
          }
        case Some(TIdent(name)) if !name.endsWith("!") && !Functions(name) &&
            name != "true" && name != "false" && name != "null" =>
          next()
          peek match {
            case Some(TPunct("=")) => next(); AssignVar(name, expr())
            case _ => p = save; ExprStmt(expr())
          }
        case _ => ExprStmt(expr())
      }
    }

    /** `.a.b` path after the leading dot; empty = whole event (`.`). */
    private def eventPath(): Vector[String] = {
      expect(".")
      val segs = Vector.newBuilder[String]
      var done = false
      while (!done) {
        peek match {
          case Some(TIdent(s)) if s != "true" && s != "false" && s != "null" =>
            next(); segs += s
            peek match {
              case Some(TPunct(".")) => next()
              case _ => done = true
            }
          case _ => done = true
        }
      }
      segs.result()
    }

    def expr(): Expr = {
      var l = sum()
      while (peek.exists { case TPunct(op) => Set("==", "!=", ">", "<", ">=", "<=")(op); case _ => false }) {
        val TPunct(op) = next(): @unchecked
        l = BinOp(op, l, sum())
      }
      l
    }

    private def sum(): Expr = {
      var l = term()
      while (peek.exists { case TPunct(op) => op == "+" || op == "-"; case _ => false }) {
        val TPunct(op) = next(): @unchecked
        l = BinOp(op, l, term())
      }
      l
    }

    private def term(): Expr = {
      var l = postfix()
      while (peek.exists { case TPunct("*") => true; case TPunct("/") => true; case _ => false }) {
        val TPunct(op) = next(): @unchecked
        l = BinOp(op, l, postfix())
      }
      l
    }

    private def postfix(): Expr = {
      var e = primary()
      var done = false
      while (!done) {
        peek match {
          case Some(TPunct("->")) =>
            next()
            expect("|")
            val param = next() match {
              case TIdent(s) => s
              case o => throw new IllegalArgumentException(s"vrl: closure param, got $o")
            }
            expect("|")
            skipNl()
            expect("{")
            skipNl()
            val body = closureBody()
            e = e match {
              case Call(fn, args, None) => Call(fn, args, Some((param, body)))
              case _ => throw new IllegalArgumentException("vrl: closure must follow a call")
            }
          case Some(TPunct(".")) =>
            // field access on a non-event expression (variable paths)
            next()
            val seg = next() match {
              case TIdent(s) => s
              case o => throw new IllegalArgumentException(s"vrl: field name, got $o")
            }
            e = e match {
              case VarRef(n, path) => VarRef(n, path :+ seg)
              case other => Call("__get", Vector(other, Lit(VStr(seg))), None)
            }
          case _ => done = true
        }
      }
      e
    }

    /** Closure body: `{ "k": v, ... }` object literal or statements whose
      * last expression is the value. */
    private def closureBody(): Vector[Stmt] = {
      // object literal if it starts with `"key" :`
      val isObj = (peek, if (p + 1 < toks.length) Some(toks(p + 1)) else None) match {
        case (Some(TStr(_)), Some(TPunct(":"))) => true
        case _ => false
      }
      if (isObj) {
        val fields = Vector.newBuilder[(String, Expr)]
        var done = false
        while (!done) {
          skipNl()
          peek match {
            case Some(TPunct("}")) => next(); done = true
            case Some(TStr(k)) =>
              next(); expect(":")
              fields += (k -> expr())
              skipNl()
              peek match {
                case Some(TPunct(",")) => next()
                case _ => ()
              }
            case o => throw new IllegalArgumentException(s"vrl: object key, got $o")
          }
        }
        Vector(ExprStmt(ObjLit(fields.result())))
      } else {
        val stmts = Vector.newBuilder[Stmt]
        skipNl()
        while (!peek.contains(TPunct("}"))) {
          stmts += stmt()
          skipNl()
        }
        next() // }
        stmts.result()
      }
    }

    private def primary(): Expr = {
      skipNl()
      next() match {
        case TNum(s) =>
          if (s.contains('.')) Lit(VFloat(s.toDouble)) else Lit(VInt(s.toLong))
        case TStr(s) => Lit(VStr(s))
        case TIdent("true") => Lit(VBool(true))
        case TIdent("false") => Lit(VBool(false))
        case TIdent("null") => Lit(VNull)
        case TIdent(name) =>
          peek match {
            case Some(TPunct("(")) =>
              if (!Functions(name))
                throw new IllegalArgumentException(
                  s"vrl: unsupported function '$name' (mini-VRL subset)")
              next()
              val args = Vector.newBuilder[Expr]
              skipNl()
              if (!peek.contains(TPunct(")"))) {
                args += expr()
                while (peek.contains(TPunct(","))) { next(); skipNl(); args += expr() }
              }
              skipNl()
              expect(")")
              Call(name, args.result(), None)
            case _ => VarRef(name, Vector.empty)
          }
        case TPunct(".") =>
          p -= 1
          EventPath(eventPath())
        case TPunct("{") =>
          val fields = Vector.newBuilder[(String, Expr)]
          skipNl()
          var done = peek.contains(TPunct("}"))
          if (done) next()
          while (!done) {
            val k = next() match {
              case TStr(s) => s
              case TIdent(s) => s
              case o => throw new IllegalArgumentException(s"vrl: object key, got $o")
            }
            expect(":")
            fields += (k -> expr())
            skipNl()
            peek match {
              case Some(TPunct(",")) => next(); skipNl()
              case _ => ()
            }
            if (peek.contains(TPunct("}"))) { next(); done = true }
          }
          ObjLit(fields.result())
        case TPunct("[") =>
          val items = Vector.newBuilder[Expr]
          skipNl()
          if (!peek.contains(TPunct("]"))) {
            items += expr()
            while (peek.contains(TPunct(","))) { next(); skipNl(); items += expr() }
          }
          skipNl()
          expect("]")
          ArrLit(items.result())
        case TPunct("(") =>
          val e = expr()
          expect(")")
          e
        case o => throw new IllegalArgumentException(s"vrl: unexpected $o")
      }
    }
  }

  // ---- evaluator ----------------------------------------------------------

  private final class Env(var event: V) {
    val vars = scala.collection.mutable.LinkedHashMap.empty[String, V]
  }

  private def getPath(v: V, path: Vector[String]): V =
    path.foldLeft(v) { (cur, seg) =>
      cur match {
        case o: VObj => o.get(seg).getOrElse(VNull)
        case _ => VNull
      }
    }

  private def setPath(v: V, path: Vector[String], nv: V): V =
    if (path.isEmpty) nv
    else {
      val obj = v match { case o: VObj => o; case _ => VObj(Vector.empty) }
      obj.updated(path.head, setPath(obj.get(path.head).getOrElse(VObj(Vector.empty)), path.tail, nv))
    }

  private def delPath(v: V, path: Vector[String]): (V, V) = v match {
    case o: VObj if path.nonEmpty =>
      if (path.length == 1) (o.get(path.head).getOrElse(VNull), o.removed(path.head))
      else o.get(path.head) match {
        case Some(child) =>
          val (removed, nchild) = delPath(child, path.tail)
          (removed, o.updated(path.head, nchild))
        case None => (VNull, o)
      }
    case other => (VNull, other)
  }

  private def truthy(v: V): Boolean = v match {
    case VNull => false
    case VBool(b) => b
    case _ => true
  }

  private def numOp(op: String, a: V, b: V): V = (a, b) match {
    case (VInt(x), VInt(y)) => op match {
      case "+" => VInt(x + y); case "-" => VInt(x - y)
      case "*" => VInt(x * y); case "/" => VFloat(x.toDouble / y)
      case _ => cmp(op, x.toDouble, y.toDouble)
    }
    case _ =>
      val x = toD(a); val y = toD(b)
      op match {
        case "+" => VFloat(x + y); case "-" => VFloat(x - y)
        case "*" => VFloat(x * y); case "/" => VFloat(x / y)
        case _ => cmp(op, x, y)
      }
  }

  private def cmp(op: String, x: Double, y: Double): V = VBool(op match {
    case ">" => x > y; case "<" => x < y
    case ">=" => x >= y; case "<=" => x <= y
    case o => throw new IllegalArgumentException(s"vrl: op $o")
  })

  private def toD(v: V): Double = v match {
    case VInt(l) => l.toDouble; case VFloat(d) => d
    case VStr(s) => s.toDouble; case VBool(b) => if (b) 1 else 0
    case _ => throw new IllegalArgumentException(s"vrl: not a number: ${typeName(v)}")
  }

  private def evalStmts(stmts: Vector[Stmt], env: Env): V = {
    var last: V = VNull
    stmts.foreach {
      case AssignEvent(path, e) =>
        val v = eval(e, env); env.event = setPath(env.event, path, v); last = v
      case AssignVar(name, e) =>
        val v = eval(e, env); env.vars(name) = v; last = v
      case ExprStmt(e) => last = eval(e, env)
    }
    last
  }

  private def eval(e: Expr, env: Env): V = e match {
    case Lit(v) => v
    case EventPath(path) => getPath(env.event, path)
    case VarRef(name, path) =>
      val base = env.vars.getOrElse(name,
        throw new IllegalArgumentException(s"vrl: undefined variable '$name'"))
      getPath(base, path)
    case ObjLit(fields) => VObj(fields.map { case (k, fe) => k -> eval(fe, env) })
    case ArrLit(items) => VArr(items.map(eval(_, env)))
    case BinOp(op, l, r) =>
      val a = eval(l, env); val b = eval(r, env)
      op match {
        case "==" => VBool(a == b)
        case "!=" => VBool(a != b)
        case "+" => (a, b) match {
          case (VStr(x), VStr(y)) => VStr(x + y)
          case _ => numOp("+", a, b)
        }
        case o => numOp(o, a, b)
      }
    case Call("del", Vector(EventPath(path)), None) =>
      val (removed, ev) = delPath(env.event, path)
      env.event = ev
      removed
    case Call("exists", Vector(EventPath(path)), None) =>
      VBool(getPath(env.event, path) != VNull)
    case Call("map_values", Vector(arg), Some((param, body))) =>
      eval(arg, env) match {
        case VArr(items) => VArr(items.map { item =>
          val inner = new Env(env.event)
          inner.vars ++= env.vars
          inner.vars(param) = item
          evalStmts(body, inner)
        })
        case VObj(fields) => VObj(fields.map { case (k, v) =>
          val inner = new Env(env.event)
          inner.vars ++= env.vars
          inner.vars(param) = v
          k -> evalStmts(body, inner)
        })
        case o => throw new IllegalArgumentException(
          s"vrl: map_values over ${typeName(o)}")
      }
    case Call(fn, args, None) =>
      val vs = args.map(eval(_, env))
      fn match {
        case "array!" => vs.head match {
          case a: VArr => a
          case o => throw new IllegalArgumentException(s"vrl: array! got ${typeName(o)}")
        }
        case "object!" => vs.head match {
          case o: VObj => o
          case o => throw new IllegalArgumentException(s"vrl: object! got ${typeName(o)}")
        }
        case "string!" => vs.head match {
          case s: VStr => s
          case o => throw new IllegalArgumentException(s"vrl: string! got ${typeName(o)}")
        }
        case "int!" => vs.head match {
          case i: VInt => i
          case o => throw new IllegalArgumentException(s"vrl: int! got ${typeName(o)}")
        }
        case "float!" => vs.head match {
          case f: VFloat => f; case VInt(l) => VFloat(l.toDouble)
          case o => throw new IllegalArgumentException(s"vrl: float! got ${typeName(o)}")
        }
        case "bool!" => vs.head match {
          case b: VBool => b
          case o => throw new IllegalArgumentException(s"vrl: bool! got ${typeName(o)}")
        }
        case "to_string" => VStr(render(vs.head))
        case "to_int" => vs.head match {
          case VInt(l) => VInt(l); case VFloat(d) => VInt(d.toLong)
          case VStr(s) => VInt(s.trim.toLong); case VBool(b) => VInt(if (b) 1 else 0)
          case o => throw new IllegalArgumentException(s"vrl: to_int got ${typeName(o)}")
        }
        case "to_float" => VFloat(toD(vs.head))
        case "upcase" => VStr(str(vs.head).toUpperCase)
        case "downcase" => VStr(str(vs.head).toLowerCase)
        case "length" => vs.head match {
          case VStr(s) => VInt(s.length)
          case VArr(a) => VInt(a.length)
          case VObj(f) => VInt(f.length)
          case o => throw new IllegalArgumentException(s"vrl: length of ${typeName(o)}")
        }
        case "merge" => (vs(0), vs(1)) match {
          case (a: VObj, b: VObj) => b.fields.foldLeft(a)((acc, kv) => acc.updated(kv._1, kv._2))
          case (a, b) => throw new IllegalArgumentException(
            s"vrl: merge(${typeName(a)}, ${typeName(b)})")
        }
        case "push" => (vs(0), vs(1)) match {
          case (VArr(a), v) => VArr(a :+ v)
          case (a, _) => throw new IllegalArgumentException(s"vrl: push to ${typeName(a)}")
        }
        case "contains" => VBool(str(vs(0)).contains(str(vs(1))))
        case "starts_with" => VBool(str(vs(0)).startsWith(str(vs(1))))
        case "ends_with" => VBool(str(vs(0)).endsWith(str(vs(1))))
        case "replace" => VStr(str(vs(0)).replace(str(vs(1)), str(vs(2))))
        case "split" => VArr(str(vs(0)).split(java.util.regex.Pattern.quote(str(vs(1))), -1)
          .toVector.map(VStr))
        case "join" => vs(0) match {
          case VArr(a) => VStr(a.map(str).mkString(str(vs(1))))
          case o => throw new IllegalArgumentException(s"vrl: join of ${typeName(o)}")
        }
        // VRL timestamps serialize as RFC-3339 text; nondeterministic by
        // nature (matches the reference's wall-clock now()) — callers
        // needing reproducible output simply don't use it
        case "now" => VStr(java.time.Instant.now().toString)
        case "abs" => vs.head match {
          case VInt(l) => VInt(math.abs(l)); case v => VFloat(math.abs(toD(v)))
        }
        case "floor" => VInt(math.floor(toD(vs.head)).toLong)
        case "ceil" => VInt(math.ceil(toD(vs.head)).toLong)
        case "round" => VInt(math.round(toD(vs.head)))
        case "__get" => vs(0) match {
          case o: VObj => o.get(str2(vs(1))).getOrElse(VNull)
          case _ => VNull
        }
        case "del" | "exists" =>
          throw new IllegalArgumentException(s"vrl: $fn needs an event path argument")
        case "map_values" =>
          throw new IllegalArgumentException("vrl: map_values needs a closure")
        case o => throw new IllegalArgumentException(s"vrl: unsupported function '$o'")
      }
    case Call(fn, _, Some(_)) =>
      throw new IllegalArgumentException(s"vrl: $fn does not take a closure")
  }

  private def str(v: V): String = v match {
    case VStr(s) => s
    case o => throw new IllegalArgumentException(s"vrl: expected string, got ${typeName(o)}")
  }
  private def str2(v: V): String = v match { case VStr(s) => s; case o => render(o) }

  // ---- JSON bridge --------------------------------------------------------

  def parseJson(s: String): V = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fromNode(mapper.readTree(s))
  }

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): V = {
    import com.fasterxml.jackson.databind.JsonNode
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) VNull
    else if (n.isBoolean) VBool(n.asBoolean())
    else if (n.isIntegralNumber) VInt(n.asLong())
    else if (n.isNumber) VFloat(n.asDouble())
    else if (n.isTextual) VStr(n.asText())
    else if (n.isArray) VArr(n.elements().asScala.toVector.map(fromNode))
    else VObj(n.fields().asScala.toVector.map(e => e.getKey -> fromNode(e.getValue)))
  }

  def render(v: V): String = v match {
    case VNull => "null"
    case VBool(b) => b.toString
    case VInt(l) => l.toString
    case VFloat(d) =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) s"${d.toLong}.0"
      else d.toString
    case VStr(s) => quote(s)
    case VArr(items) => items.map(render).mkString("[", ",", "]")
    case VObj(fields) =>
      fields.map { case (k, fv) => s"${quote(k)}:${render(fv)}" }.mkString("{", ",", "}")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\t' => sb ++= "\\t"
      case '\r' => sb ++= "\\r"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }

  // ---- run ----------------------------------------------------------------

  /** Execute over one event and return the result as a SCALAR — used by
    * the `table_suffix` hook (pipeline/src/tablesuffix.rs), whose VRL
    * expression yields the per-row table-name suffix. Strings render
    * bare (no quotes); null → None. */
  def runScalar(prog: Program, json: String): Option[String] = {
    val env = new Env(parseJson(json))
    evalStmts(prog.stmts, env) match {
      case VNull => None
      case VStr(s) => Some(s)
      case other => Some(render(other))
    }
  }

  /** Execute over one event (JSON object string) and return the
    * resulting rows as JSON object strings — one-to-many per the
    * reference's contract (object = 1 row, array = N object rows,
    * each element must be an object). */
  def runToRows(prog: Program, json: String): Seq[String] = {
    val env = new Env(parseJson(json))
    evalStmts(prog.stmts, env) match {
      case o: VObj => Seq(render(o))
      case VArr(items) => items.zipWithIndex.map {
        case (o: VObj, _) => render(o)
        case (other, i) => throw new IllegalArgumentException(
          s"Array element at index $i must be an object for one-to-many transformation, got ${typeName(other)}")
      }
      case other => throw new IllegalArgumentException(
        s"vrl: program must resolve to an object or array, got ${typeName(other)}")
    }
  }
}
