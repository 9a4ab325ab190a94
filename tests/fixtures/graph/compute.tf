variable "region" {
  type    = string
  default = "us-west-2"
}

data "aws_ami" "ubuntu" {
  most_recent = true
}

resource "aws_instance" "web" {
  ami       = data.aws_ami.ubuntu.id
  subnet_id = aws_subnet.a.id

  vpc_security_group_ids = [aws_security_group.sg.id]

  tags = {
    Name = "web-${var.region}"
    Net  = aws_subnet.a.cidr_block
  }
}
