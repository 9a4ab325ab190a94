# plain rename: same resource type, new name
moved {
  from = aws_instance.a
  to   = aws_instance.b
}

# retype: provider deprecated the resource type in place
moved {
  from = aws_instance.web
  to   = aws_spot_instance.web
}

# module rename
moved {
  from = module.old_net
  to   = module.net
}

# resource pulled into a module
moved {
  from = aws_s3_bucket.logs
  to   = module.storage.aws_s3_bucket.logs
}

resource "aws_instance" "b" {
  ami = "ami-12345678"
}
